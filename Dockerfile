# Packaging parity with the reference's Dockerfile (nvidia/cuda + conda +
# jupyter): here a minimal TPU-VM-ready image — JAX with the TPU runtime,
# the dip-tpu package, and the CLI as entrypoint.
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY dip_tpu ./dip_tpu
COPY bench.py __graft_entry__.py ./

# On a real TPU VM use: pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir jax flax optax orbax-checkpoint pillow numpy \
    && pip install --no-cache-dir -e . --no-build-isolation

ENTRYPOINT ["python", "-m", "dip_tpu"]
CMD ["bench", "--size", "512", "--iters", "100"]
