"""TPU-native simulation core: pure jittable step over dense padded arrays."""
