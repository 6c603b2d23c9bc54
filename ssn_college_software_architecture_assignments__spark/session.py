"""SparkSession factory and session tuning.

The reference prescribes a single-process Python ETL script per connector
(``/root/reference/README.md:20-23,74``). Our unit of execution is instead a
SparkSession whose lazy DataFrame lineage *is* the E->T->L pipeline; this
module centralizes the session configuration that the 100 TB-scale posture
requires (AQE, UTC session time, Arrow transfers, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .scratch import scratch_dir

# Runtime-settable confs we also force onto driver-provided sessions
# (the correctness driver builds its own SparkSession and hands it to us).
_RUNTIME_CONFS = {
    # Oracle comparison (DuckDB) is UTC-naive; pin the session timezone.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-planning (partition coalescing, skew-join splitting,
    # broadcast demotion) — core of the scale posture, free to enable.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all Python<->JVM transfers (pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Exact TIMESTAMP parquet rebase behavior — fixtures are post-1900 so
    # CORRECTED is both fastest and right.
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    # Parquet TIMESTAMP(NANOS) is otherwise PARQUET_TYPE_ILLEGAL; read the
    # raw int64 and let Catalog._normalize rebuild a µs timestamp.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    """The session's core budget: ``SPARK_GRAFT_CPUS`` when the driver
    sets it (the bench contract — its low-core pass scales everything
    derived from this down with it), else the host's real core count —
    a literal fallback would create that many state stores / shuffle
    partitions per stateful operator on a smaller machine (r18 advisory)."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


_PKG_SHIPPED_APP_IDS: set[str] = set()
# failed ship attempts per applicationId; retrying covers transient
# failures, the bound stops a PERSISTENT failure (read-only /tmp, disk
# full) from silently re-zipping the whole package on every query
_PKG_SHIP_ATTEMPTS: dict[str, int] = {}
_PKG_SHIP_MAX_ATTEMPTS = 3


def _ship_package_to_workers(spark: SparkSession) -> None:
    """Make the engine package importable on executor Python workers.

    mapInPandas / pandas_udf kernels defined at module level are pickled
    BY REFERENCE (cloudpickle), so workers must be able to import this
    package. A driver process that merely did ``sys.path.insert`` from a
    foreign cwd satisfies the DRIVER import but not the workers (the
    runtime sys.path edit never reaches PYTHONPATH, and local-mode
    workers inherit only the JVM's env). Shipping the package once via
    ``addPyFile`` closes that gap; skipped when the repo root is already
    worker-visible (PYTHONPATH or cwd), which covers every in-repo
    entry point (tests, bench, check_oracle). Never allowed to fail a
    query — any error degrades to the historical behavior. Keyed on the
    applicationId, not a process flag: a driver that stops its session
    and builds a new one needs the zip shipped AGAIN (addPyFile state
    dies with the context)."""
    tmp_dir = None
    try:
        app_id = spark.sparkContext.applicationId
        if app_id in _PKG_SHIPPED_APP_IDS:
            return
        if _PKG_SHIP_ATTEMPTS.get(app_id, 0) >= _PKG_SHIP_MAX_ATTEMPTS:
            return
        import os
        import shutil

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        root = os.path.normpath(os.path.dirname(pkg_dir))
        worker_paths = [
            os.path.normpath(p)
            for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p
        ]
        if root in worker_paths or os.path.normpath(os.getcwd()) == root:
            # already worker-visible — remember so repeat calls stay cheap
            _PKG_SHIPPED_APP_IDS.add(app_id)
            return
        _PKG_SHIP_ATTEMPTS[app_id] = _PKG_SHIP_ATTEMPTS.get(app_id, 0) + 1
        tmp_dir = scratch_dir(prefix="ssn_spark_pkg_")
        archive = shutil.make_archive(
            os.path.join(tmp_dir, "ssn_spark_pkg"),
            "zip",
            root_dir=root,
            base_dir=os.path.basename(pkg_dir),
        )
        spark.sparkContext.addPyFile(archive)
        # only a SUCCESSFUL ship disables retries: a transient failure
        # (full tmpdir, fs error) must not permanently skip shipping.
        # The archive dir is kept alive on success — executors fetch the
        # zip lazily from this path for the app's whole lifetime.
        tmp_dir = None
        _PKG_SHIPPED_APP_IDS.add(app_id)
    except Exception:
        pass
    finally:
        if tmp_dir is not None:
            # failed attempt: don't leak one temp dir per retry
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Safe to call repeatedly; used on driver-provided sessions where we do
    not control ``SparkSession.builder``.
    """
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Some confs may be static in exotic deployments; never fail
            # a query over a tuning knob.
            pass
    _ship_package_to_workers(spark)
    return spark


def build_session(
    app_name: str = "ssn-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    Local mode is a single JVM with N executor threads; on a real cluster
    the same confs hold — shuffle partitions should then track
    ``cores * executors`` (or be left to AQE coalescing, which we enable).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or cpus),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_session(spark)
