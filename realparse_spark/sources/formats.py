"""Multi-format table sink/source (parquet / ORC / JSON-lines / CSV).

The reference's I/O surface is log text + MySQL tables; a Spark rebuild
additionally needs the standard interchange formats a 100 TB pipeline
meets at its edges (CSV/JSON landing zones, columnar parquet/ORC at
rest).  Format choice matters at scale:

- parquet/ORC: columnar, splittable, predicate pushdown + column pruning
  reach the scan — the only sane at-rest formats.
- json/csv:    row formats for ingest/export edges only.  Reading REQUIRES
  an explicit schema: schema inference is a full extra pass over the data
  (and non-deterministic on dirty input), so `read_table` refuses to infer
  unless explicitly asked.
- compression: all writers default to snappy (parquet/orc) / gzip
  (json/csv) — splittability is preserved for the columnar formats;
  gzipped text is not splittable, which is fine for export edges and
  wrong for scan paths (documented so callers don't put .json.gz on the
  hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

_WRITE_DEFAULTS: dict[str, dict[str, str]] = {
    "parquet": {"compression": "snappy"},
    "orc": {"compression": "snappy"},
    "json": {"compression": "gzip"},
    "csv": {"compression": "gzip", "header": "true"},
}

_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "parquet": {},
    "orc": {},
    "json": {},
    "csv": {"header": "true"},
}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode).options(**{**_WRITE_DEFAULTS[fmt], **options})
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """Read a table written by `write_table`.  For json/csv a schema is
    required (or `infer=True` to opt into the extra inference pass —
    never on the 100 TB path)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.format(fmt).options(**{**_READ_DEFAULTS[fmt], **options})
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        if not infer:
            raise ValueError(
                f"{fmt} read requires an explicit schema (or infer=True: "
                "a full extra pass over the data — not a 100 TB pattern)"
            )
        if fmt == "csv":
            reader = reader.option("inferSchema", "true")
    return reader.load(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV landing-zone read with malformed-row QUARANTINE:
    returns ``(good, bad)`` where ``good`` carries the typed rows and
    ``bad`` the rows whose raw line failed the schema (parse error,
    bad numeric, wrong arity), with the verbatim line preserved in
    ``corrupt_col`` — the standard ingest pattern for dirty edges
    (never FAILFAST on a 100 TB landing zone: one bad line must not
    kill the job, and silently nulling it loses the evidence).

    The caller's schema must NOT include the corrupt column; it is
    appended here.  Spark parses the well-formed fields of a bad row
    too, so quarantined rows keep their usable keys for triage.

    Implementation note: this deliberately reads TEXT + `from_csv`
    rather than `spark.read.csv` with a corrupt-record column — the
    native reader parses only the columns each branch references, so a
    branch that doesn't touch the malformed field never triggers the
    parse error and the quarantine silently empties (the documented
    cache-the-DataFrame caveat).  `from_csv` parses the whole struct as
    ONE expression, which column pruning cannot split.  Headerless
    lines (a landing zone of raw records).  Scale: one pass, no
    inference, no cache, splittable as long as the input is."""
    from pyspark.sql import functions as F

    if isinstance(schema, StructType):
        schema = schema.simpleString()[7:-1].replace(":", " ")  # struct<..>
    full = f"{schema}, {corrupt_col} string"
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": corrupt_col,
        **{k: v for k, v in options.items() if k != "header"},
    }
    parsed = (
        spark.read.text(path)
        .select(F.from_csv(F.col("value"), full, opts).alias("r"))
        .select("r.*")
    )
    data_cols = [c for c in parsed.columns if c != corrupt_col]
    good = parsed.filter(F.col(corrupt_col).isNull()).select(*data_cols)
    bad = parsed.filter(F.col(corrupt_col).isNotNull())
    return good, bad
