"""CLI tools shipped with the package (console entry points; see
pyproject.toml [project.scripts]). The repo-root `tools/` directory keeps
thin shims at the reference-parity paths."""
