# RIFE-TPU serving image (reference Dockerfile / docker-compose.yml).
# Runs on a TPU VM host (the TPU runtime is provided by the host's
# /dev/accel* devices and libtpu; use a TPU-enabled base in production).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg libgl1 libglib2.0-0 curl && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY rife_tpu ./rife_tpu

RUN pip install --no-cache-dir -e . && \
    pip install --no-cache-dir "jax[tpu]" opencv-python-headless gradio || \
    pip install --no-cache-dir jax opencv-python-headless

# Model checkpoint is mounted or baked at train_log/ (flownet.rtpu or
# the reference flownet.pkl — both load through the importer).
RUN mkdir -p train_log temp

ENV GRADIO_SERVER_NAME=0.0.0.0
EXPOSE 7860

HEALTHCHECK --interval=30s --timeout=5s \
    CMD curl -sf http://localhost:7860/health || exit 1

CMD ["python", "-m", "rife_tpu.serve.app", "--port", "7860"]
