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
