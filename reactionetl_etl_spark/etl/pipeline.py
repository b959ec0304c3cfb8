"""Lakehouse ETL pipeline: the reference's main() re-expressed on Spark.

Reference flow (/root/reference/main.py:6-50): per-file loop of
clean → COPY → audit → move-directories, then a batched UPDATE-join.
Engine flow (one run = one call to `run_once`):

    discover new files (manifest anti-join — replaces directory moves)
      → cleanse CSVs       (grouped distributed scans, quarantine split)
      → append fact parquet, partitioned by day
      → cleanse metadata   (validate, dedupe, dense simulation_num)
      → append dim parquet
      → append audit events (per-file running→terminal pairs)
      → append manifest     (processed-file registry)
    enrichment (`materialize_enrichment`): rewrite only day-partitions
    that still hold NULL simulation_num rows — dynamic partition
    overwrite, broadcast dim join, everything else untouched.

Lake layout (all plain parquet — swap for Delta/Iceberg in production
to get ACID appends + MERGE; layout and plans are unchanged):

    <lake>/fact_sim/day=<d>/*.parquet
    <lake>/dim_rxn/*.parquet
    <lake>/audit/*.parquet        append-only status events
    <lake>/quarantine/*.parquet   rejected rows/files with reasons
    <lake>/manifest/*.parquet     files already processed (M1/M2 state)

Incrementality/idempotency: at-least-once, like the reference
(README.md:15) — a crash between data append and manifest append can
reprocess a file; deterministic row_id = xxhash64(simulation_id,
rxn_time, source day) makes such replays detectable/dedupable
downstream. Unlike the reference, a file rejected by validation is
recorded in the manifest with its reason and not retried forever.

Scale notes: every data-path operation here is a distributed scan,
map-side join, or columnar append; the only driver-side collections are
file lists and per-file row counts (metadata-sized). Fact writes are
day-partitioned so downstream time-ranged queries prune; enrichment
touches only unenriched partitions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.audit import AuditEvent, events_df, new_etl_id
from reactionetl_etl_spark.logging_config import get_logger, setup_logging
from reactionetl_etl_spark.etl.cleanse import (
    cleanse_incoming_csvs,
    cleanse_metadata_jsons,
)
from reactionetl_etl_spark.etl.enrich import (
    assign_simulation_nums,
    current_max_simulation_num,
    enrich_fact,
)
from reactionetl_etl_spark.sources.raw import RawFile, list_raw_files

log = get_logger("etl.pipeline")


@dataclass
class RunResult:
    fact_rows_loaded: int
    dim_rows_loaded: int
    files_processed: int
    files_quarantined: int


class ReactionLake:
    def __init__(self, lake_root: str, log_dir: str | None = None):
        self.root = lake_root.rstrip("/")
        self.fact_path = f"{self.root}/fact_sim"
        self.dim_path = f"{self.root}/dim_rxn"
        self.audit_path = f"{self.root}/audit"
        self.quarantine_path = f"{self.root}/quarantine"
        self.manifest_path = f"{self.root}/manifest"
        # Operational (driver-side) logs, reference logging_config.py
        # parity: rotating info.log + error.log under <lake>/logs unless
        # pointed elsewhere. The audit table stays the queryable record.
        setup_logging(log_dir or f"{self.root}/logs")

    # -- table readers ----------------------------------------------------

    def _read_or_none(self, spark: SparkSession, path: str) -> DataFrame | None:
        if not os.path.exists(path):
            return None
        return spark.read.parquet(path)

    def fact(self, spark: SparkSession) -> DataFrame | None:
        return self._read_or_none(spark, self.fact_path)

    def dim(self, spark: SparkSession) -> DataFrame | None:
        return self._read_or_none(spark, self.dim_path)

    def audit(self, spark: SparkSession) -> DataFrame | None:
        return self._read_or_none(spark, self.audit_path)

    def quarantine(self, spark: SparkSession) -> DataFrame | None:
        return self._read_or_none(spark, self.quarantine_path)

    def manifest(self, spark: SparkSession) -> DataFrame | None:
        return self._read_or_none(spark, self.manifest_path)

    def fact_enriched(self, spark: SparkSession) -> DataFrame:
        """Read-time enrichment view: always-current simulation_num
        without waiting for materialization (one broadcast join)."""
        fact, dim = self.fact(spark), self.dim(spark)
        if fact is None:
            raise FileNotFoundError(f"no fact table at {self.fact_path}")
        if dim is None:
            return fact
        return enrich_fact(fact, dim)

    # -- incremental discovery (M1/M2 replacement) ------------------------

    def _new_files(self, spark: SparkSession, listed: list[RawFile]) -> list[RawFile]:
        """Filter out files already in the manifest.

        The listed backlog is driver-side (it is metadata); membership
        is checked with a join against the manifest table so the
        manifest itself never has to fit on the driver.
        """
        if not listed:
            return []
        manifest = self.manifest(spark)
        if manifest is None:
            return listed
        listed_df = spark.createDataFrame(
            [(f.path, f.day) for f in listed], "path string, day string"
        )
        fresh = (
            listed_df.join(
                manifest.select(F.col("source_file").alias("path")), on="path", how="left_anti"
            )
            .collect()
        )
        return [RawFile(r["path"], r["day"]) for r in fresh]

    # -- the run ----------------------------------------------------------

    def run_once(
        self, spark: SparkSession, incoming_root: str, now: datetime | None = None
    ) -> RunResult:
        """Process every not-yet-processed file under incoming/<day>/."""
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        csvs = self._new_files(spark, list_raw_files(incoming_root, ".csv"))
        jsons = self._new_files(spark, list_raw_files(incoming_root, ".json"))
        log.info(
            "run_once: %d new reaction CSVs, %d new metadata JSONs under %s",
            len(csvs), len(jsons), incoming_root,
        )

        audit_events: list[AuditEvent] = []
        manifest_rows: list[tuple[str, str, str, str, datetime]] = []
        fact_loaded = dim_loaded = quarantined_files = 0

        # ---- reaction CSVs → fact_sim (EP2 + W2) ----
        csv_result = None
        if csvs:
            result = csv_result = cleanse_incoming_csvs(spark, csvs)
            fact_new = result.clean.withColumns(
                {
                    # deterministic row id: stable under at-least-once replay
                    "row_id": F.xxhash64("simulation_id", "rxn_time", "source_file"),
                    "simulation_num": F.lit(None).cast("int"),
                }
            ).select(
                "row_id",
                "simulation_id",
                "simulation_num",
                "ca",
                "cb",
                "cc",
                "cd",
                "temperature",
                "t_sensor",
                "rxn_time",
                "source_file",
                "day",
            )
            fact_new.write.mode("append").partitionBy("day").parquet(self.fact_path)

            # per-file row counts: one small aggregate (rows = files)
            counts = {
                _strip_scheme(r["source_file"]): r["n"]
                for r in fact_new.groupBy("source_file").agg(F.count("*").alias("n")).collect()
            }
            bad_rows = {
                _strip_scheme(r["source_file"]): r["n"]
                for r in result.quarantined.groupBy("source_file")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if bad_rows:
                result.quarantined.write.mode("append").parquet(self.quarantine_path)

            rejected_paths = {f.path for f, _ in result.rejected_files}
            for f in csvs:
                etl_id = new_etl_id()
                sim_id = _sim_id_from_name(f.path, "reaction", ".csv")
                audit_events.append(
                    AuditEvent(etl_id, now, sim_id, "reaction", None, None, "running", None, f.path, f.day)
                )
                n_ok = counts.get(f.path, 0)
                n_bad = bad_rows.get(f.path, 0)
                if f.path in rejected_paths:
                    reason = dict((rf.path, why) for rf, why in result.rejected_files)[f.path]
                    status, err = "quarantined", reason
                    quarantined_files += 1
                elif n_bad and not n_ok:
                    status, err = "quarantined", f"{n_bad} malformed rows"
                    quarantined_files += 1
                else:
                    status, err = "success", None if not n_bad else f"{n_bad} rows quarantined"
                    fact_loaded += n_ok
                if status == "quarantined":
                    log.warning("quarantined %s: %s", f.path, err)
                else:
                    log.info("ingested %s: %d rows (%s)", f.path, n_ok, err or "clean")
                audit_events.append(
                    AuditEvent(etl_id, now, sim_id, "reaction", n_ok, None, status, err, f.path, f.day)
                )
                manifest_rows.append((f.path, f.day, "reaction", status, now))

            if rejected_paths:
                rej = spark.createDataFrame(
                    [
                        (None, why, rf.path, rf.day)
                        for rf, why in result.rejected_files
                    ],
                    "payload string, reason string, source_file string, day string",
                )
                rej.write.mode("append").parquet(self.quarantine_path)

        # ---- metadata JSONs → dim_rxn (V3 + W3 + X4) ----
        if jsons:
            result = cleanse_metadata_jsons(spark, jsons)
            existing_dim = self.dim(spark)
            new_meta = result.clean
            if existing_dim is not None:
                # PK semantics (create_tables.sql:19): never load a
                # simulation_id twice — skip already-present, dedupe batch
                new_meta = new_meta.join(
                    existing_dim.select("simulation_id"), on="simulation_id", how="left_anti"
                )
            new_meta = new_meta.dropDuplicates(["simulation_id"])
            offset = current_max_simulation_num(existing_dim) if existing_dim is not None else 0
            dim_new = assign_simulation_nums(new_meta, offset).select(
                "simulation_id",
                "simulation_num",
                "reaction_name",
                "activation_energy",
                "ca0",
                "cb0",
                "t0",
                "date_run",
                "stop_reason",
                "stop_time_s",
                "source_file",
                "day",
            ).persist()
            # Collect the audit set BEFORE appending: dim_new's plan
            # reads dim_path (the anti-join), and the append refreshes
            # cached plans on that path — a post-write recompute would
            # see its own output and anti-join the new rows away.
            loaded_files = {
                _strip_scheme(r["source_file"])
                for r in dim_new.select("source_file").distinct().collect()
            }
            dim_new.write.mode("append").parquet(self.dim_path)
            dim_new.unpersist()
            bad_files = {
                _strip_scheme(r["source_file"])
                for r in result.quarantined.select("source_file").distinct().collect()
            }
            if bad_files:
                result.quarantined.write.mode("append").parquet(self.quarantine_path)
            for f in jsons:
                etl_id = new_etl_id()
                sim_id = _sim_id_from_name(f.path, "metadata_", ".json")
                audit_events.append(
                    AuditEvent(etl_id, now, sim_id, "metadata", None, None, "running", None, f.path, f.day)
                )
                if f.path in bad_files:
                    status, err, n = "quarantined", "metadata validation failed", 0
                    quarantined_files += 1
                elif f.path in loaded_files:
                    status, err, n = "success", None, 1
                    dim_loaded += 1
                else:  # valid but duplicate simulation_id → skipped
                    status, err, n = "success", "duplicate simulation_id (skipped)", 0
                if status == "quarantined":
                    log.warning("quarantined metadata %s: %s", f.path, err)
                else:
                    log.info("metadata %s: %s", f.path, err or "loaded")
                audit_events.append(
                    AuditEvent(etl_id, now, sim_id, "metadata", n, None, status, err, f.path, f.day)
                )
                manifest_rows.append((f.path, f.day, "metadata", status, now))

        # ---- audit + manifest appends ----
        if audit_events:
            events_df(spark, audit_events).write.mode("append").parquet(self.audit_path)
        if manifest_rows:
            spark.createDataFrame(
                manifest_rows,
                "source_file string, day string, etl_type string, status string,"
                " ingested_at timestamp_ntz",
            ).write.mode("append").parquet(self.manifest_path)

        if csv_result is not None:
            csv_result.release()
        log.info(
            "run_once done: %d fact rows, %d dim rows, %d files (%d quarantined)",
            fact_loaded, dim_loaded, len(csvs) + len(jsons), quarantined_files,
        )
        return RunResult(fact_loaded, dim_loaded, len(csvs) + len(jsons), quarantined_files)

    # -- enrichment (EP3) -------------------------------------------------

    def materialize_enrichment(self, spark: SparkSession) -> int:
        """J1 as one broadcast join, persisted.

        Rewrites ONLY day-partitions that still contain NULL
        simulation_num rows (dynamic partition overwrite); enriched
        days are never touched. Returns rows newly enriched.
        With Delta this is `MERGE WHEN MATCHED UPDATE`; on plain
        parquet, partition-scoped rewrite is the idiomatic equivalent.
        """
        fact, dim = self.fact(spark), self.dim(spark)
        if fact is None or dim is None:
            return 0
        days = [
            r["day"]
            for r in fact.filter(F.col("simulation_num").isNull()).select("day").distinct().collect()
        ]
        if not days:
            return 0
        subset = fact.filter(F.col("day").isin(days)).withColumn(
            "__was_null", F.col("simulation_num").isNull()
        )
        # Break lineage before overwriting the path we just read
        # (Spark refuses a cycle otherwise). localCheckpoint holds the
        # enriched partitions on executors; with Delta this whole method
        # is a single MERGE and the checkpoint disappears.
        enriched = enrich_fact(subset, dim).localCheckpoint(eager=True)
        n_newly = enriched.filter(
            F.col("__was_null") & F.col("simulation_num").isNotNull()
        ).count()
        (
            enriched.drop("__was_null")
            .write.mode("overwrite")
            .partitionBy("day")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.fact_path)
        )
        return n_newly


def _sim_id_from_name(path: str, prefix: str, suffix: str) -> str | None:
    """Filename-derived simulation id (main.py:23,36 slicing, done safely)."""
    name = os.path.basename(path)
    if name.startswith(prefix) and name.endswith(suffix):
        return name[len(prefix) : -len(suffix)] or None
    return None


def _strip_scheme(path: str) -> str:
    """input_file_name() returns file: URIs for local paths; the file
    listing produces plain paths. Normalize to plain for comparison."""
    if "://" in path:
        return "/" + path.split("://", 1)[1].lstrip("/")
    if path.startswith("file:"):
        return "/" + path[5:].lstrip("/")
    return path
