"""Batch sources beyond parquet (SURVEY.md §2.2 X-SRC-2, §2.1 R-SRC-1..3).

The reference ingests from HTTP APIs row-by-row into pandas
(/root/reference/etl.py:121-134, 255-295, 359-391). The engine's
equivalents are declarative readers with *explicit schemas* — schema
inference is a correctness hazard (a month of all-null columns flips
types) and a perf hazard (an extra full scan) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True, mode: str = "PERMISSIVE",
             corrupt_col: str | None = None) -> DataFrame:
    """CSV with a declared schema — no inferSchema scan.

    ``mode``/``corrupt_col`` set the malformed-record policy explicitly
    (see read_json): at 100 TB one bad line must neither fail the whole
    ingest (FAILFAST everywhere) nor vanish silently (bare PERMISSIVE);
    naming a corrupt column quarantines it for reprocessing."""
    reader = spark.read.option("header", header).option("mode", mode)
    if corrupt_col is not None:
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType,
              mode: str = "PERMISSIVE",
              corrupt_col: str | None = None) -> DataFrame:
    """JSON-lines with a declared schema (nested structs/arrays land as
    native types — the reference's dict-walking at etl.py:273-291
    becomes plain column access).

    Malformed-record policy is explicit: PERMISSIVE (default) null-fills
    unparseable rows, and naming ``corrupt_col`` captures each one's raw
    text in that column — the quarantine pattern (filter it out for the
    clean frame, write it aside for reprocessing). mode="FAILFAST"
    instead refuses the batch — right when any corruption means the
    upstream export itself is broken."""
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).json(path)


def from_api_payload(spark: SparkSession, records: list[dict],
                     schema: StructType) -> DataFrame:
    """REST-source seam (R-SRC-1..3): a driver-side fetcher hands the
    payload here; everything after is distributed. The fetch itself
    stays out of the engine — at scale the listing is parallelized and
    workers fetch via mapInPandas, but the *plan* shape is identical."""
    return spark.createDataFrame(records, schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (ORC carries its own schema; no inference scan). Kept for parity
    with warehouses whose history is ORC-backed (Hive-era lakes)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str,
              whole: bool = False) -> DataFrame:
    """Raw text lines as a one-column ('value') frame — the ingest
    grain for log files and WET-style corpus dumps feeding the LLM
    text operators (llm/textstats.py). wholetext=True reads one row
    per FILE (document-grain) instead of per line; at 100 TB prefer
    line grain so splits parallelize within large files."""
    return spark.read.text(path, wholetext=whole)


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """`binaryFile` source: (path, modificationTime, length, content)
    with the payload as an opaque binary column — the ingestion rung
    under llm/multimodal.py (images/audio enter the lake exactly like
    this, then decode executor-side via mapInPandas). Filters on the
    METADATA columns (length, path, modificationTime) push down to the
    file listing, so "skip files > 100 MB" never reads a byte of
    content."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_xml(spark: SparkSession, path: str, row_tag: str,
             schema: StructType | None = None) -> DataFrame:
    """XML source (built into Spark 4 core — the old spark-xml
    package): one row per `row_tag` element. Same explicit-schema
    guidance as CSV/JSON; inference on XML additionally pays a full
    parse pass. The legacy-feed format in finance ETL (regulatory
    filings, FIXML-ish exports) — the reference never got to it, its
    requirements.txt stops at JSON APIs."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
