# ----------------------------------------------------------------------
# game-data ETL pipeline — PySpark engine, containerized
#
# Operational parity with the reference deployment surface
# (reference Dockerfile:26-32): same entrypoint contract (`--once` by
# default, no args = scheduled mode), same warehouse-exists healthcheck,
# restart policy supplied by compose.
#
# Base image: Spark needs a JVM, so we start from a JRE-equipped Python
# image instead of python:slim. On a real cluster this image is the
# DRIVER; executors come from the cluster manager (spark.master is
# config-driven, local[*] by default for single-node parity runs).
# ----------------------------------------------------------------------
FROM eclipse-temurin:17-jre-jammy

# Python runtime on top of the JRE base
RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sf /usr/bin/python3 /usr/local/bin/python

WORKDIR /app

# dependencies first (layer caching)
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

# application code
COPY game_data_etl_pipeline_spark/ ./game_data_etl_pipeline_spark/

# data directory for the parquet warehouse, landing zone, and logs
RUN mkdir -p /app/data

ENV PYTHONUNBUFFERED=1
ENV TZ=UTC
ENV PYTHONPATH=/app

# healthcheck: warehouse exists and holds at least one table directory
# (parquet-warehouse analogue of the reference's db-file existence check)
HEALTHCHECK --interval=60s --timeout=10s --retries=3 \
    CMD python -c "import os, sys; d='/app/data/warehouse'; sys.exit(0 if os.path.isdir(d) and any(os.path.isdir(os.path.join(d, t)) for t in os.listdir(d)) else 1)"

# run once by default; compose overrides with no args for scheduled mode
ENTRYPOINT ["python", "-m", "game_data_etl_pipeline_spark.etl.pipeline"]
CMD ["--once"]
