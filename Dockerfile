# Container install story — counterpart of the reference's Dockerfile
# (/root/reference/Dockerfile:1: ubuntu + toolchain + miniconda + `pip
# install .`). Ours installs the package from pyproject.toml on a slim
# Python base; g++ is needed because the conflict-cross compile kernel
# (cityflow_tpu/native/crosses.cpp) self-builds via ctypes on first use.
#
#   docker build -t cityflow-tpu .
#   docker run --rm cityflow-tpu                      # 4x4 bench smoke (CPU)
#   docker run --rm cityflow-tpu cityflow-tpu-run \
#       --configFile /work/tests/fixtures/config_2x2.json -s 100
#
# On a TPU VM, base this on a jax[tpu] image (or pip install jax[tpu]
# inside) and drop JAX_PLATFORMS=cpu; the package itself is platform-
# agnostic — the TPU path is selected by the available jax backend.
FROM python:3.12-slim

RUN apt-get update && \
    apt-get install -y --no-install-recommends g++ && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /work
COPY pyproject.toml README.md ./
COPY cityflow_tpu ./cityflow_tpu
RUN pip install --no-cache-dir "jax[cpu]" && \
    pip install --no-cache-dir ".[rl]"

# fixtures + bench entry for the default smoke command
COPY tests/fixtures ./tests/fixtures
COPY benchmarks ./benchmarks
COPY bench.py __graft_entry__.py ./
# the fixture configs pin the build host's absolute paths (oracle
# reproducibility); localize them to the image
RUN sed -i "s#/root/repo#/work#g" tests/fixtures/*.json benchmarks/*.json

ENV JAX_PLATFORMS=cpu
CMD ["cityflow-tpu-bench", "--config", "tests/fixtures/config_4x4.json", \
     "--batch", "2", "--steps", "8", "--warmup", "2"]
