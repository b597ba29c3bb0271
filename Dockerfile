# Runnable deployment image — parity with the reference's container
# (/root/reference/Dockerfile: python-slim base + runtime deps + a
# long-lived scheduler process). Here the runtime dep is a JVM for
# Spark instead of chromium for selenium, and the scheduler is the
# engine's own cron-cadence tick loop (deploy.py). The reference
# starts dagster-webserver AND dagster-daemon in ONE container
# (reference Dockerfile:22); the matching shape here is the combined
# mode: `docker run -p 8387:8387 ... --serve 8387 --daemon --bind
# 0.0.0.0` (or --cron, which implies --daemon) serves the run screen
# while firing scheduled ticks from the same process. --bind 0.0.0.0
# is required for the published port to reach the in-container server
# (the default 127.0.0.1 bind is loopback-only, as dagster dev's is).
#
# Two build targets:
#   docker build -t spark-graft .                   # default: no browser
#   docker build --target browser -t spark-graft:browser .
# The `browser` stage adds chromium + chromedriver + selenium (the
# reference image's rendering stack, reference Dockerfile:10) for
# crawling JS-rendered sites via render_transport; the gated test
# tests/test_transport.py::test_render_transport_real_chromium_smoke
# runs (instead of skipping) inside it.
FROM python:3.11-slim AS base

# Spark needs a JVM; headless JRE keeps the image small.
RUN apt-get update \
    && apt-get install -y --no-install-recommends default-jre-headless procps \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml setup.py README.md ./
COPY etl_dagster_service_crawler_spark ./etl_dagster_service_crawler_spark
RUN pip install --no-cache-dir .

# Mount the lake at /data (source fixtures/landing zone) and /output
# (main + side sinks). The run_history table lands in the warehouse.
ENV DATA_DIR=/data \
    OUTPUT_DIR=/output \
    SPARK_WAREHOUSE=/output/warehouse \
    SPARK_MASTER=local[*]

# Default: the 2-minute schedule loop (the reference's cron); pass
# --once for a single availableNow tick (CI smoke / backfill), or
# --serve 8387 --daemon --bind 0.0.0.0 for the reference's
# webserver+daemon pair.
ENTRYPOINT ["python", "-m", "etl_dagster_service_crawler_spark.deploy"]

# ---- browser stage: JS-rendering crawl (reference Dockerfile:10) ----
# chromium + matching chromedriver from the distro (version-locked to
# each other, the pairing the reference manages by hand), selenium for
# the WebDriver client. Wire it with:
#   render_transport(lambda: webdriver.Chrome(service=Service(
#       "/usr/bin/chromedriver"), options=headless_opts))
FROM base AS browser
RUN apt-get update \
    && apt-get install -y --no-install-recommends \
        chromium chromium-driver fonts-liberation \
    && rm -rf /var/lib/apt/lists/* \
    && pip install --no-cache-dir selenium

# LAST stage wins as the default target: re-select the minimal image so
# a plain `docker build .` ships WITHOUT the browser stack (post-review
# fix — the browser stage being last silently made it the default).
FROM base AS release
