# Deployment image for meterelf-tpu (reference ships an ubuntu+opencv
# image; the TPU build needs jax[tpu] and a C toolchain for the native
# JPEG decoder, which builds on first import).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        gcc libjpeg62-turbo-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY meterelf_tpu ./meterelf_tpu

# TPU runtime: jax[tpu] resolves libtpu on Cloud TPU VMs
RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

ENTRYPOINT ["meterelf-tpu"]

# --- dev stage: the type-correctness gate the build image can't run ---
# (the build sandbox has no network, so mypy cannot be installed there;
# tests/test_codequality.py::test_mypy_if_available runs the near-strict
# config in pyproject.toml whenever mypy IS present — this stage is where
# it always is. requirements.lock pins the validated runtime stack.)
FROM python:3.12-slim AS dev
RUN apt-get update && apt-get install -y --no-install-recommends \
        gcc libjpeg62-turbo-dev \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY pyproject.toml README.md requirements.lock ./
COPY meterelf_tpu ./meterelf_tpu
COPY tests ./tests
RUN pip install --no-cache-dir mypy pytest pyyaml numpy pillow jax \
    && pip install --no-cache-dir --no-deps .
# the gate: near-strict mypy over the package (pyproject.toml [tool.mypy])
RUN python -m mypy meterelf_tpu
