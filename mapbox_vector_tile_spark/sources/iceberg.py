"""Pure-Python Apache Iceberg v2 table layer — metadata, manifests, scan.

The north-star contract reads "Iceberg tables of pre-tokenized training
sequences"; the runtime jar for Spark's Iceberg datasource does not ship
in this sandbox, so this module implements the PUBLIC Iceberg Table Spec
(iceberg.apache.org/spec/, format-version 2) directly over the same
primitives the rest of the engine uses: JSON table metadata, Avro OCF
manifest lists + manifests (:mod:`.avro_ocf`, itself cross-checked
against the Java avro jar), and parquet data files read/written by Spark.

What is implemented (the v2 read/write subset a token corpus needs):

- table layout: ``{table}/metadata/v{N}.metadata.json``,
  ``version-hint.text``, ``snap-*.avro`` manifest lists, ``*-m*.avro``
  manifests; ``{table}/data/`` parquet files;
- commits: CREATE + APPEND (new snapshot, parent lineage, sequence
  numbers, refs/main branch head, snapshot-log) and a DELETE-files commit
  (manifest rewritten with DELETED entry statuses — how Iceberg expresses
  data-file removal without touching the files);
- scan planning: snapshot selection (current, by id, or by
  ``as-of-sequence``), manifest-list -> manifest fan-in, entry statuses
  (ADDED/EXISTING live, DELETED dropped), content filter (data vs delete
  files), then ONE ``spark.read.parquet(*files)`` over the surviving
  files — the file list is metadata-sized by contract, the data path
  stays Spark's vectorized parquet reader end to end;
- schema round-trip: Iceberg struct JSON with stable field-ids <->
  Spark/arrow types (primitives + list<int>, what the corpus uses).

Determinism: snapshot ids, uuids and timestamps derive from the commit
sequence (not wall clock), so identical inputs produce byte-identical
metadata trees — the repo-wide reproducibility contract (resume drills
diff whole directories).

Also implemented: identity partition specs WITH partition evolution
(new specs become the write default; files keep their original spec,
scans resolve per file, ``rewrite_data_files`` migrates), per-file
column bounds in manifest entries (from parquet footer statistics;
``plan_scan`` prunes on partition values AND bounds before any footer
or data byte is touched, reads apply the same predicates as residual
data filters), position + equality delete files merge-on-read, and
schema evolution with field-id resolution.

Partition transforms: identity plus the spec's bucket[N] (spec-exact
murmur3_x86_32), truncate[W], and year/month/day/hour — point predicates
on a transform's SOURCE column prune at the metadata level through the
transform. Catalogs: the filesystem (Hadoop-style) catalog lives in
:mod:`.iceberg_catalog` (warehouse dir + dotted identifiers + the
``iceberg://warehouse::ns.table`` URI form). Not implemented (documented,
not hidden): NETWORK catalog services (Hive metastore, REST) — service
clients, not table-format semantics, and this sandbox has no network.

Reference parity anchor: the reference's tile container wraps layers the
same way Iceberg metadata wraps data files — a self-describing envelope
listing typed members (/root/reference/mapbox_vector_tile/decoder.py
tile envelope parse); here the envelope is the spec's real metadata tree.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid as _uuid
from dataclasses import dataclass
from typing import Any

import pandas as pd  # module-level: pandas_udf type hints resolve via module globals

from . import avro_ocf as A

FORMAT_VERSION = 2
_EPOCH_MS = 1_700_000_000_000  # deterministic timestamp base (not wall clock)


# ---------------------------------------------------------------------------
# schema conversion: Spark DDL-ish <-> Iceberg struct JSON
# ---------------------------------------------------------------------------

_PRIM_TO_ICE = {
    "string": "string",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
}
_ICE_TO_SPARK = {
    "string": "string",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
}


def schema_to_iceberg(spark_schema) -> dict:
    """Spark StructType -> Iceberg schema JSON with sequential field ids
    (nested list element ids follow their parent, pyiceberg-style)."""
    fields = []
    next_id = 1
    for f in spark_schema.fields:
        fid = next_id
        next_id += 1
        fields.append({"id": fid, "name": f.name, "required": False,
                       "type": None, "_spark": f.dataType})
    # assign element ids after all top-level ids (spec: unique in schema)
    for entry in fields:
        dt = entry.pop("_spark")
        s = dt.simpleString()
        if s.startswith("array<"):
            elem = s[6:-1]
            if elem not in _PRIM_TO_ICE:
                raise ValueError(f"unsupported array element type: {elem}")
            entry["type"] = {
                "type": "list",
                "element-id": next_id,
                "element": _PRIM_TO_ICE[elem],
                "element-required": False,
            }
            next_id += 1
        elif s in _PRIM_TO_ICE:
            entry["type"] = _PRIM_TO_ICE[s]
        else:
            raise ValueError(f"unsupported type for iceberg schema: {s}")
    return {"type": "struct", "schema-id": 0, "fields": fields}


def current_schema(meta: dict) -> dict:
    sid = meta.get("current-schema-id", 0)
    for s in meta["schemas"]:
        if s.get("schema-id", 0) == sid:
            return s
    raise ValueError(f"current-schema-id {sid} not in schemas")


def _schema_by_id(meta: dict, sid: int) -> dict:
    for s in meta["schemas"]:
        if s.get("schema-id", 0) == sid:
            return s
    # pre-evolution metadata never recorded per-snapshot schema ids;
    # those tables have exactly one schema
    return meta["schemas"][0]


def _spark_type_of(field: dict) -> str:
    t = field["type"]
    if isinstance(t, dict) and t.get("type") == "list":
        return f"array<{_ICE_TO_SPARK[t['element']]}>"
    return _ICE_TO_SPARK[t]


def evolve_schema(
    table_path: str,
    add: list[tuple[str, str]] | None = None,
    rename: dict[str, str] | None = None,
    drop: list[str] | None = None,
) -> dict:
    """Metadata-only schema evolution (spec: no snapshot, no data rewrite).

    ``add`` = [(name, spark_type)] assigns FRESH field ids from
    ``last-column-id`` (ids are never reused — the spec invariant that
    makes renames and drops safe); ``rename`` keeps the field id and
    changes only the name; ``drop`` retires the field (old data files
    keep the bytes, scans stop projecting them). Partition source columns
    refuse rename/drop (their spec fields reference them by id but
    readers key manifests by name here).

    Readers resolve every data file BY FIELD ID against the schema the
    file was written under (each snapshot records its ``schema-id``):
    renamed columns read the old physical name, added columns backfill
    NULL for pre-evolution files — Iceberg's column-resolution contract.
    """
    meta = load_metadata(table_path)
    cur = current_schema(meta)
    # guard by SOURCE id: transform fields (doc_id_bucket) have their own
    # names, but it's the source column that must not be dropped/renamed
    spec_src_ids = {
        f["source-id"] for s in meta["partition-specs"] for f in s["fields"]
    }
    spec_cols = {
        f["name"] for f in cur["fields"] if f["id"] in spec_src_ids
    }
    fields = [dict(f) for f in cur["fields"]]
    names = {f["name"] for f in fields}

    for name in drop or []:
        if name in spec_cols:
            raise ValueError(f"cannot drop partition column {name!r}")
        if name not in names:
            raise ValueError(f"drop: unknown column {name!r}")
        fields = [f for f in fields if f["name"] != name]
        names.discard(name)
    for old, new in (rename or {}).items():
        if old in spec_cols:
            raise ValueError(f"cannot rename partition column {old!r}")
        if old not in names:
            raise ValueError(f"rename: unknown column {old!r}")
        if new in names:
            raise ValueError(f"rename: column {new!r} already exists")
        for f in fields:
            if f["name"] == old:
                f["name"] = new
        names.discard(old)
        names.add(new)

    next_id = meta.get("last-column-id", 0)
    for name, spark_type in add or []:
        if name in names:
            raise ValueError(f"add: column {name!r} already exists")
        next_id += 1
        fid = next_id
        if spark_type.startswith("array<"):
            elem = spark_type[6:-1]
            next_id += 1
            ftype: Any = {
                "type": "list",
                "element-id": next_id,
                "element": _PRIM_TO_ICE[elem],
                "element-required": False,
            }
        else:
            ftype = _PRIM_TO_ICE[spark_type]
        fields.append(
            {"id": fid, "name": name, "required": False, "type": ftype}
        )
        names.add(name)

    new_sid = max(s.get("schema-id", 0) for s in meta["schemas"]) + 1
    new_schema = {"type": "struct", "schema-id": new_sid, "fields": fields}
    meta["schemas"].append(new_schema)
    meta["current-schema-id"] = new_sid
    meta["last-column-id"] = max(meta.get("last-column-id", 0), next_id)
    version = _read_version(table_path) + 1
    meta["last-updated-ms"] = _EPOCH_MS + version
    _write_metadata(table_path, meta, version)
    return new_schema


def iceberg_to_spark_ddl(schema: dict) -> str:
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, dict) and t.get("type") == "list":
            cols.append(f"{f['name']} array<{_ICE_TO_SPARK[t['element']]}>")
        else:
            cols.append(f"{f['name']} {_ICE_TO_SPARK[t]}")
    return ", ".join(cols)


# ---------------------------------------------------------------------------
# avro schemas for manifest list / manifest (spec field ids)
# ---------------------------------------------------------------------------

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

def manifest_entry_schema(partition_fields: list[dict] | None = None) -> dict:
    """The manifest_entry avro schema; partitioned tables add the spec's
    ``partition`` record (field-id 102, one field per partition field with
    its spec field-id) — value types string-only here (identity transform
    on a string column, what the corpus partitions by)."""
    data_file_fields = [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
    ]
    if partition_fields:
        data_file_fields.append({
            "name": "partition", "field-id": 102, "type": {
                "type": "record", "name": "r102", "fields": [
                    {"name": pf["name"], "type": ["null", "string"],
                     "default": None, "field-id": pf["field-id"]}
                    for pf in partition_fields
                ],
            },
        })
    data_file_fields += [
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "equality_ids",
         "type": ["null", {"type": "array", "items": "int",
                           "element-id": 136}],
         "default": None, "field-id": 135},
        # column bounds (spec field-ids 125/128). The spec serializes
        # map<field-id, binary single-value>; this implementation stores
        # map<column-name, string single-value> — same information, plain
        # avro maps, still Java-avro-valid. Readers coerce by schema type.
        {"name": "lower_bounds",
         "type": ["null", {"type": "map", "values": "string"}],
         "default": None, "field-id": 125},
        {"name": "upper_bounds",
         "type": ["null", {"type": "map", "values": "string"}],
         "default": None, "field-id": 128},
    ]
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2", "fields": data_file_fields,
            }},
        ],
    }


MANIFEST_ENTRY_SCHEMA = manifest_entry_schema()

# entry statuses (spec)
EXISTING, ADDED, DELETED = 0, 1, 2

# file content ids (spec): data, position deletes, equality deletes
DATA, POSITION_DELETES, EQUALITY_DELETES = 0, 1, 2


# ---------------------------------------------------------------------------
# metadata tree
# ---------------------------------------------------------------------------

@dataclass
class DataFile:
    file_path: str
    record_count: int
    file_size_in_bytes: int
    # data sequence number: the commit that ADDED the file (spec
    # inheritance — a null entry seq inherits the manifest's); carried
    # so EXISTING entries keep their original lineage across rewrites
    sequence_number: int | None = None
    # spec content id: 0 data, 1 position deletes (parquet of
    # (file_path, pos) rows), 2 equality deletes (parquet of the equality
    # columns; field ids in equality_ids)
    content: int = DATA
    equality_ids: list[int] | None = None
    # identity-transform partition values, e.g. {"source": "web"}
    partition: dict | None = None
    # partition spec the file was WRITTEN under (evolution: files keep
    # their original spec forever; scans resolve per-file)
    spec_id: int = 0
    # per-file column bounds from the parquet footer (name -> string-
    # serialized value; the spec stores field-id -> binary single-value,
    # same information) — scan planning prunes files whose bounds cannot
    # intersect a predicate before any footer or byte is touched
    lower_bounds: dict | None = None
    upper_bounds: dict | None = None


def _meta_dir(table_path: str) -> str:
    return os.path.join(table_path, "metadata")


def _read_version(table_path: str) -> int:
    hint = os.path.join(_meta_dir(table_path), "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            return int(fh.read().strip())
    best = 0
    if os.path.isdir(_meta_dir(table_path)):
        for name in os.listdir(_meta_dir(table_path)):
            if name.startswith("v") and name.endswith(".metadata.json"):
                best = max(best, int(name[1:].split(".")[0]))
    if not best:
        raise FileNotFoundError(f"no iceberg metadata under {table_path}")
    return best


def load_metadata(table_path: str) -> dict:
    v = _read_version(table_path)
    with open(os.path.join(_meta_dir(table_path), f"v{v}.metadata.json")) as fh:
        return json.load(fh)


def _write_metadata(table_path: str, meta: dict, version: int) -> None:
    md = _meta_dir(table_path)
    os.makedirs(md, exist_ok=True)
    path = os.path.join(md, f"v{version}.metadata.json")
    with open(path, "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write(str(version))


def _det_uuid(seed: str) -> str:
    return str(_uuid.UUID(bytes=hashlib.md5(seed.encode()).digest()))


# ---------------------------------------------------------------------------
# Partition transforms (Iceberg spec "Partition Transforms"):
# identity, bucket[N], truncate[W], year/month/day/hour.
# bucket[N] = (murmur3_x86_32(spec serialization) & Int.MAX_VALUE) % N with
# the spec's hash serialization: int/long hash as the 8-byte little-endian
# LONG (so int 34 and long 34 land in the same bucket — spec requirement),
# strings hash their UTF-8 bytes; dates hash as days-from-epoch longs,
# timestamps as micros-from-epoch longs. Verified against the spec's
# published appendix vectors (34 -> 2017239379, "iceberg" -> 1210000089).
# ---------------------------------------------------------------------------

_MURMUR_C1 = 0xCC9E2D51
_MURMUR_C2 = 0x1B873593


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Scalar murmur3_x86_32 (public algorithm, Austin Appleby), signed
    int32 result — the hash the Iceberg bucket transform specifies."""
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * _MURMUR_C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _MURMUR_C2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[rounded:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _MURMUR_C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _MURMUR_C2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h if h < 2**31 else h - 2**32


def _murmur3_32_long_np(v):
    """Vectorized murmur3_x86_32 over int64 values serialized as 8-byte
    little-endian (the spec's long serialization) — the write-path fast
    path for bucketed integer keys. Bit-identical to the scalar form
    (cross-checked in tests)."""
    import numpy as np

    words = (
        np.ascontiguousarray(v, dtype="<i8").view("<u4").reshape(-1, 2)
    )
    h = np.zeros(words.shape[0], dtype=np.uint32)
    for j in (0, 1):
        k = words[:, j].copy()
        k *= np.uint32(_MURMUR_C1)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k *= np.uint32(_MURMUR_C2)
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # length
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h.astype(np.int32)


def bucket_value(value, n: int, ice_type: str) -> int:
    """Spec bucket transform of one value (planner-side: turns a point
    predicate on the source column into a partition-value predicate)."""
    if ice_type in ("int", "long"):
        data = int(value).to_bytes(8, "little", signed=True)
    elif ice_type == "string":
        data = str(value).encode("utf-8")
    elif ice_type == "date":
        data = int(value).to_bytes(8, "little", signed=True)
    elif ice_type.startswith("timestamp"):
        data = int(value).to_bytes(8, "little", signed=True)
    else:
        raise ValueError(f"bucket transform unsupported for {ice_type}")
    return (murmur3_x86_32(data) & 0x7FFFFFFF) % int(n)


def truncate_value(value, w: int, ice_type: str):
    """Spec truncate transform of one value: ints floor to a multiple of
    ``w`` (works for negatives: -1 trunc 10 -> -10), strings keep their
    first ``w`` code points."""
    if ice_type in ("int", "long"):
        v = int(value)
        return v - (v % int(w))  # Python % floors: matches the spec
    if ice_type == "string":
        return str(value)[: int(w)]
    raise ValueError(f"truncate transform unsupported for {ice_type}")


_TIME_TRANSFORMS = ("year", "month", "day", "hour")


def time_transform_value(value_us: int, kind: str) -> int:
    """Spec temporal transforms of one timestamp (micros from epoch) —
    ordinals from 1970: year/month counts, day/hour floors."""
    import datetime as _dt

    dt = _dt.datetime(1970, 1, 1) + _dt.timedelta(
        microseconds=int(value_us)
    )
    if kind == "year":
        return dt.year - 1970
    if kind == "month":
        return (dt.year - 1970) * 12 + (dt.month - 1)
    if kind == "day":
        return int(value_us) // 86_400_000_000
    if kind == "hour":
        return int(value_us) // 3_600_000_000
    raise ValueError(f"unknown temporal transform {kind!r}")


def parse_partition_term(term: str) -> tuple[str, str, int | None]:
    """``"source"`` / ``"bucket(8, doc_id)"`` / ``"truncate(16, n_tok)"``
    / ``"day(ts)"`` -> (source column, transform string, param)."""
    t = term.strip()
    if "(" not in t:
        return t, "identity", None
    head, rest = t.split("(", 1)
    head = head.strip()
    args = [a.strip() for a in rest.rstrip(")").split(",")]
    if head in ("bucket", "truncate"):
        if len(args) != 2:
            raise ValueError(f"{head} needs (N, column): {term!r}")
        n = int(args[0])
        if n < 1:
            raise ValueError(f"{head} width must be >= 1: {term!r}")
        return args[1], f"{head}[{n}]", n
    if head in _TIME_TRANSFORMS:
        if len(args) != 1:
            raise ValueError(f"{head} needs (column): {term!r}")
        return args[0], head, None
    raise ValueError(f"unknown partition transform {head!r} in {term!r}")


def transform_field_name(col: str, transform: str) -> str:
    """Spec-conventional partition field names (col_bucket, col_trunc,
    col_day, ...)."""
    if transform == "identity":
        return col
    if transform.startswith("bucket["):
        return f"{col}_bucket"
    if transform.startswith("truncate["):
        return f"{col}_trunc"
    return f"{col}_{transform}"


def apply_transform_to_value(value, transform: str, ice_type: str):
    """Planner-side transform application: the partition value a row with
    this SOURCE value lands in (used to turn source-column point
    predicates into partition-value predicates)."""
    if transform == "identity":
        return value
    if transform.startswith("bucket["):
        return bucket_value(value, int(transform[7:-1]), ice_type)
    if transform.startswith("truncate["):
        return truncate_value(value, int(transform[9:-1]), ice_type)
    if transform in _TIME_TRANSFORMS:
        return time_transform_value(value, transform)
    raise ValueError(f"unknown transform {transform!r}")


def _transform_column(df, field: dict, ice_type: str):
    """Spark Column computing a partition field from its source column —
    Catalyst where expressible (truncate, temporal), an Arrow-batched
    pandas UDF only for bucket's murmur3 (vectorized numpy for int
    family; per-row scalar hashing for strings — a partition-derivation
    pass bounded by the append, not a corpus hot path)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    col = F.col(field["_source_name"])
    tr = field["transform"]
    if tr == "identity":
        return col
    if tr.startswith("truncate["):
        w = int(tr[9:-1])
        if ice_type == "string":
            return F.substring(col, 1, w)
        return (col - F.pmod(col, F.lit(w))).cast("long")
    if tr in _TIME_TRANSFORMS:
        us = col.cast("long")  # timestamps arrive as micros-from-epoch
        if tr == "day":
            return F.floor(us / F.lit(86_400_000_000)).cast("long")
        if tr == "hour":
            return F.floor(us / F.lit(3_600_000_000)).cast("long")
        ts = F.timestamp_micros(us)
        if tr == "year":
            return (F.year(ts) - F.lit(1970)).cast("long")
        return (
            (F.year(ts) - F.lit(1970)) * F.lit(12) + F.month(ts) - F.lit(1)
        ).cast("long")
    if tr.startswith("bucket["):
        import pandas as pd

        n = int(tr[7:-1])
        if ice_type in ("int", "long", "date") or ice_type.startswith(
            "timestamp"
        ):
            @pandas_udf("long")
            def _bucket_int(s: pd.Series) -> pd.Series:
                import numpy as np

                v = s.to_numpy(dtype=np.int64)
                h = _murmur3_32_long_np(v).astype(np.int64)
                return pd.Series((h & 0x7FFFFFFF) % n)

            return _bucket_int(col.cast("long"))

        @pandas_udf("long")
        def _bucket_str(s: pd.Series) -> pd.Series:
            return s.map(
                lambda x: (
                    murmur3_x86_32(str(x).encode("utf-8")) & 0x7FFFFFFF
                ) % n
            ).astype("int64")

        return _bucket_str(col)
    raise ValueError(f"unknown transform {tr!r}")


def _validate_transform_type(transform: str, ice_type: str, col: str):
    if transform == "identity":
        if ice_type != "string":
            raise ValueError(
                f"identity partitioning supports string columns; {col!r} "
                f"is {ice_type}"
            )
    elif transform.startswith("bucket["):
        if ice_type not in ("int", "long", "string", "date") and not str(
            ice_type
        ).startswith("timestamp"):
            raise ValueError(
                f"bucket transform unsupported for {col!r}: {ice_type}"
            )
    elif transform.startswith("truncate["):
        if ice_type not in ("int", "long", "string"):
            raise ValueError(
                f"truncate transform unsupported for {col!r}: {ice_type}"
            )
    elif transform in _TIME_TRANSFORMS:
        # micros-from-epoch longs are this engine's timestamp carrier
        if ice_type != "long" and not str(ice_type).startswith("timestamp"):
            raise ValueError(
                f"{transform} transform needs a timestamp/micros-long "
                f"column; {col!r} is {ice_type}"
            )
    else:
        raise ValueError(f"unknown transform {transform!r}")


def _spec_fields_from_terms(
    ice_schema: dict, terms: list[str], known: dict, last_pid: int
) -> tuple[list[dict], int]:
    """Partition terms (``"source"``, ``"bucket(8, doc_id)"``, ...) ->
    spec field dicts, reusing field-ids for (source, transform) pairs
    seen in any prior spec (spec rule)."""
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    fields = []
    for term in terms:
        col, tr, _ = parse_partition_term(term)
        if col not in by_name:
            raise ValueError(f"partition column {col!r} not in schema")
        _validate_transform_type(tr, by_name[col]["type"], col)
        sid = by_name[col]["id"]
        fid = known.get((sid, tr))
        if fid is None:
            last_pid += 1
            fid = last_pid
        fields.append({
            "name": transform_field_name(col, tr),
            "transform": tr,
            "source-id": sid,
            "field-id": fid,
        })
    if len({f["name"] for f in fields}) != len(fields):
        raise ValueError(f"duplicate partition field names in {terms!r}")
    return fields, last_pid


def create_table(
    table_path: str, spark_schema, partition_by: list[str] | None = None
) -> dict:
    """CREATE: v1 metadata, no snapshots yet. ``partition_by`` declares
    the partition spec — identity terms (string columns) or spec
    transforms (``"bucket(8, doc_id)"``, ``"truncate(16, n_tok)"``,
    ``"day(ts_us)"``); partition values then live in manifest entries and
    scans prune at the METADATA level before any parquet file is
    opened."""
    ice_schema = schema_to_iceberg(spark_schema)
    spec_fields, last_pid = _spec_fields_from_terms(
        ice_schema, partition_by or [], {}, 999
    )
    meta = {
        "format-version": FORMAT_VERSION,
        "table-uuid": _det_uuid(table_path),
        "location": table_path,
        "last-sequence-number": 0,
        "last-updated-ms": _EPOCH_MS,
        "last-column-id": 64,
        "current-schema-id": 0,
        "schemas": [ice_schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": last_pid,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": -1,
        "refs": {},
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }
    _write_metadata(table_path, meta, 1)
    return meta


def _spec_by_id(meta: dict, spec_id: int) -> dict:
    for s in meta["partition-specs"]:
        if s["spec-id"] == spec_id:
            return s
    raise ValueError(f"unknown partition spec-id {spec_id}")


def _default_spec(meta: dict) -> dict:
    return _spec_by_id(meta, meta.get("default-spec-id", 0))


def evolve_partition_spec(table_path: str, partition_by: list[str]) -> dict:
    """Partition evolution (spec v2): append a NEW spec and make it the
    default for future writes. Existing data files keep the spec they were
    written under forever — scans resolve partition columns per file, and
    metadata pruning applies exactly where a file's own spec covers the
    predicate (old-spec files fall back to the data filter). A later
    ``rewrite_data_files`` migrates everything to the new layout.

    Field-ids are REUSED for a (source column, transform) pair that
    already appeared in any prior spec (spec rule: partition field ids are
    assigned once per transform+source across the table's history).
    Terms accept the same transform syntax as ``create_table``
    (``"bucket(8, doc_id)"`` etc.)."""
    meta = load_metadata(table_path)
    known = {
        (f["source-id"], f["transform"]): f["field-id"]
        for s in meta["partition-specs"]
        for f in s["fields"]
    }
    fields, last_pid = _spec_fields_from_terms(
        current_schema(meta), partition_by,
        known, meta.get("last-partition-id", 999),
    )
    default = _default_spec(meta)
    if fields == default["fields"]:
        return meta  # no-op: already the default layout
    new_id = max(s["spec-id"] for s in meta["partition-specs"]) + 1
    meta["partition-specs"].append({"spec-id": new_id, "fields": fields})
    meta["default-spec-id"] = new_id
    meta["last-partition-id"] = last_pid
    version = _read_version(table_path) + 1
    meta["last-updated-ms"] = _EPOCH_MS + version
    _write_metadata(table_path, meta, version)
    return meta


def _branch_head(meta: dict, branch: str) -> int:
    """Snapshot id a commit on ``branch`` builds on: the branch ref if it
    exists, else the current main head (a new branch forks from main)."""
    ref = meta.get("refs", {}).get(branch)
    if ref is not None:
        return ref["snapshot-id"]
    return meta["current-snapshot-id"]


def _commit(
    table_path: str,
    live_files: list[DataFile],
    removed_files: list[DataFile],
    operation: str,
    branch: str = "main",
) -> dict:
    """Write manifest + manifest list + next metadata version. The new
    snapshot's single manifest carries every live file (EXISTING for
    carried-over, ADDED for new) plus DELETED tombstones — the simple
    rewrite strategy; real Iceberg also reuses unchanged manifests, which
    is an optimization not a semantics change."""
    meta = load_metadata(table_path)
    version = _read_version(table_path) + 1
    seq = meta["last-sequence-number"] + 1
    snap_id = (
        max(s["snapshot-id"] for s in meta["snapshots"]) + 1
        if meta["snapshots"] else 1
    )

    base_snap = _branch_head(meta, branch)
    prev_seq: dict[str, int | None] = {}
    if base_snap != -1:
        prev_seq = {
            f.file_path: f.sequence_number
            for f in _plan_files(table_path, meta, base_snap, content=None)
        }

    md = _meta_dir(table_path)
    os.makedirs(md, exist_ok=True)
    manifests = []  # manifest-list rows
    counters = {"added": 0, "existing": 0, "deleted": 0,
                "r_added": 0, "r_deleted": 0}

    # one manifest per (content kind, partition spec) present — spec rules:
    # a manifest stores data files OR delete files, never both, and every
    # entry in a manifest shares one partition spec (evolution can leave
    # live files under several specs)
    by_group: dict[tuple[int, int],
                   tuple[list[DataFile], list[DataFile]]] = {}
    for df in live_files:
        by_group.setdefault((df.content, df.spec_id), ([], []))[0].append(df)
    for df in removed_files:
        by_group.setdefault((df.content, df.spec_id), ([], []))[1].append(df)

    for mi, ((content_id, spec_id), (live, gone)) in enumerate(
        sorted(by_group.items())
    ):
        entries = []
        n_added = n_existing = n_deleted = 0
        r_added = r_existing = r_deleted = 0
        min_seq = seq
        for df in live:
            status = EXISTING if df.file_path in prev_seq else ADDED
            if status == ADDED:
                n_added += 1
                r_added += df.record_count
            else:
                n_existing += 1
                r_existing += df.record_count
                if prev_seq[df.file_path] is not None:
                    min_seq = min(min_seq, prev_seq[df.file_path])
            entries.append({
                "status": status,
                "snapshot_id": snap_id,
                # ADDED inherits the committing manifest's seq (null);
                # EXISTING keeps the sequence number it was added at
                "sequence_number": (
                    None if status == ADDED else prev_seq[df.file_path]
                ),
                "file_sequence_number": None,
                "data_file": {
                    "content": df.content,
                    "file_path": df.file_path,
                    "file_format": "PARQUET",
                    "partition": df.partition or {},
                    "record_count": df.record_count,
                    "file_size_in_bytes": df.file_size_in_bytes,
                    "equality_ids": df.equality_ids,
                    "lower_bounds": df.lower_bounds,
                    "upper_bounds": df.upper_bounds,
                },
            })
        for df in gone:
            n_deleted += 1
            r_deleted += df.record_count
            entries.append({
                "status": DELETED,
                "snapshot_id": snap_id,
                "sequence_number": seq,
                "file_sequence_number": None,
                "data_file": {
                    "content": df.content,
                    "file_path": df.file_path,
                    "file_format": "PARQUET",
                    "partition": df.partition or {},
                    "record_count": df.record_count,
                    "file_size_in_bytes": df.file_size_in_bytes,
                    "equality_ids": df.equality_ids,
                    "lower_bounds": df.lower_bounds,
                    "upper_bounds": df.upper_bounds,
                },
            })
        muuid = _det_uuid(
            f"{table_path}:manifest:{snap_id}:{content_id}:{spec_id}"
        )
        manifest_path = os.path.join(md, f"{muuid}-m{mi}.avro")
        spec_fields = _spec_by_id(meta, spec_id)["fields"]
        manifest_bytes = A.write_ocf(
            manifest_entry_schema(spec_fields or None),
            entries,
            codec="deflate",
            extra_meta={
                "schema": json.dumps(current_schema(meta)).encode(),
                "partition-spec": json.dumps(spec_fields).encode(),
                "partition-spec-id": str(spec_id).encode(),
                "format-version": b"2",
                "content": b"data" if content_id == DATA else b"deletes",
            },
        )
        with open(manifest_path, "wb") as fh:
            fh.write(manifest_bytes)
        manifests.append({
            "manifest_path": manifest_path,
            "manifest_length": len(manifest_bytes),
            "partition_spec_id": spec_id,
            "content": 0 if content_id == DATA else 1,
            "sequence_number": seq,
            "min_sequence_number": min_seq,
            "added_snapshot_id": snap_id,
            "added_files_count": n_added,
            "existing_files_count": n_existing,
            "deleted_files_count": n_deleted,
            "added_rows_count": r_added,
            "existing_rows_count": r_existing,
            "deleted_rows_count": r_deleted,
        })
        if content_id == DATA:
            counters["added"] += n_added
            counters["deleted"] += n_deleted
            counters["r_added"] += r_added
            counters["r_deleted"] += r_deleted

    mlist_name = f"snap-{snap_id}-1-{_det_uuid(f'{table_path}:snap:{snap_id}')}.avro"
    mlist_path = os.path.join(md, mlist_name)
    mlist_bytes = A.write_ocf(
        MANIFEST_LIST_SCHEMA,
        manifests,
        codec="deflate",
        extra_meta={"format-version": b"2"},
    )
    with open(mlist_path, "wb") as fh:
        fh.write(mlist_bytes)
    n_added, n_deleted = counters["added"], counters["deleted"]
    r_added, r_deleted = counters["r_added"], counters["r_deleted"]

    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": base_snap if base_snap != -1 else None,
        "sequence-number": seq,
        "timestamp-ms": _EPOCH_MS + version,
        "manifest-list": mlist_path,
        "schema-id": meta.get("current-schema-id", 0),
        "summary": {
            "operation": operation,
            "added-data-files": str(n_added),
            "deleted-data-files": str(n_deleted),
            "added-records": str(r_added),
            "deleted-records": str(r_deleted),
        },
    }
    meta["snapshots"].append(snapshot)
    meta.setdefault("refs", {})[branch] = {
        "snapshot-id": snap_id, "type": "branch"
    }
    if branch == "main":
        meta["snapshot-log"].append(
            {"snapshot-id": snap_id, "timestamp-ms": _EPOCH_MS + version}
        )
        meta["current-snapshot-id"] = snap_id
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = _EPOCH_MS + version
    _write_metadata(table_path, meta, version)
    return snapshot


def commit_append(
    table_path: str, new_files: list[DataFile], branch: str = "main"
) -> dict:
    meta = load_metadata(table_path)
    base = _branch_head(meta, branch)
    live = []
    if base != -1:
        live = _plan_files(table_path, meta, base, content=None)
    return _commit(table_path, live + new_files, [], "append", branch)


def commit_delete_files(table_path: str, remove_paths: set[str]) -> dict:
    """Remove whole data files (Iceberg 'delete' operation expressed as
    DELETED manifest entries; the parquet files themselves stay for time
    travel, like real Iceberg until expire-snapshots)."""
    meta = load_metadata(table_path)
    cur = _plan_files(
        table_path, meta, meta["current-snapshot-id"], content=None
    )
    keep = [f for f in cur if f.file_path not in remove_paths]
    gone = [f for f in cur if f.file_path in remove_paths]
    return _commit(table_path, keep, gone, "delete")


# ---------------------------------------------------------------------------
# scan planning
# ---------------------------------------------------------------------------

def publish_branch(table_path: str, branch: str) -> dict:
    """WAP publish: fast-forward main to the branch head — a metadata-only
    operation (new metadata version, NO new snapshot), exactly Iceberg's
    ref move. Readers following main see the staged commits atomically."""
    meta = load_metadata(table_path)
    ref = meta.get("refs", {}).get(branch)
    if ref is None:
        raise ValueError(f"unknown branch {branch!r}")
    version = _read_version(table_path) + 1
    meta["refs"]["main"] = {"snapshot-id": ref["snapshot-id"], "type": "branch"}
    meta["current-snapshot-id"] = ref["snapshot-id"]
    meta["snapshot-log"].append(
        {"snapshot-id": ref["snapshot-id"], "timestamp-ms": _EPOCH_MS + version}
    )
    meta["last-updated-ms"] = _EPOCH_MS + version
    del meta["refs"][branch]
    _write_metadata(table_path, meta, version)
    return meta


def drop_branch(table_path: str, branch: str) -> dict:
    """WAP reject: drop the staging ref; main never saw the audit's
    commits (their snapshots stay in history, unreferenced — expirable)."""
    meta = load_metadata(table_path)
    if branch not in meta.get("refs", {}):
        raise ValueError(f"unknown branch {branch!r}")
    version = _read_version(table_path) + 1
    del meta["refs"][branch]
    meta["last-updated-ms"] = _EPOCH_MS + version
    _write_metadata(table_path, meta, version)
    return meta


def _snapshot(meta: dict, snapshot_id: int | None) -> dict:
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
        if snapshot_id == -1:
            raise ValueError("table has no snapshots")
    for s in meta["snapshots"]:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(f"unknown snapshot-id {snapshot_id}")


def _plan_files(
    table_path: str,
    meta: dict,
    snapshot_id: int | None,
    content: int | None = DATA,
) -> list[DataFile]:
    """Manifest-list -> manifests -> live files for a snapshot.
    ``content`` filters to data (0) or position-delete (1) files;
    ``None`` returns everything live (commit carry-over planning)."""
    snap = _snapshot(meta, snapshot_id)
    with open(snap["manifest-list"], "rb") as fh:
        _, _, manifests = A.read_ocf(fh.read())
    out: list[DataFile] = []
    for m in manifests:
        with open(m["manifest_path"], "rb") as fh:
            _, _mmeta, entries = A.read_ocf(fh.read())
        for e in entries:
            if e["status"] == DELETED:
                continue
            d = e["data_file"]
            if content is not None and d.get("content", 0) != content:
                continue
            eff_seq = e.get("sequence_number")
            if eff_seq is None:  # spec inheritance from the manifest
                eff_seq = m.get("sequence_number")
            out.append(DataFile(
                d["file_path"], d["record_count"], d["file_size_in_bytes"],
                eff_seq, d.get("content", 0), d.get("equality_ids"),
                d.get("partition") or None,
                m.get("partition_spec_id", 0),
                d.get("lower_bounds"), d.get("upper_bounds"),
            ))
    return out


def _coerce_bound(ice_type: str, s: str):
    if ice_type in ("int", "long", "date"):
        return int(s)
    if ice_type in ("float", "double"):
        return float(s)
    if ice_type == "boolean":
        return s == "true"
    return s


def plan_scan(
    table_path: str,
    snapshot_id: int | None = None,
    content: int | None = DATA,
    partition_filter: dict | None = None,
    range_filter: dict | None = None,
) -> list[DataFile]:
    """Live files of a snapshot, pruned at the METADATA level — no parquet
    footer or byte is touched for a dropped file.

    ``partition_filter`` keys are SOURCE columns (e.g. ``{"source":
    "web"}``, ``{"doc_id": "doc-00000123"}``) and prune by manifest-entry
    partition values THROUGH the spec's transform: an identity field
    compares verbatim, a ``bucket[N]`` field compares the filter value's
    bucket, ``truncate[W]``/temporal fields compare the transformed
    value — residual-safe in every case because equality on the source
    implies equality of any transform of it. With partition evolution a
    file is dropped only when ITS OWN spec covers the key (spec
    semantics: old-spec files can't be judged by a partition value they
    never stored — the column bounds usually still prune them, and the
    read applies the residual data filter either way).

    ``range_filter`` maps column -> ``(lo, hi)`` (either end ``None`` for
    open) and prunes on the per-file column bounds the commit recorded
    from parquet footers (files predating bounds are conservatively
    kept) AND through MONOTONIC partition transforms: truncate[W],
    year/month/day/hour, and identity are order-preserving, so
    ``v in [lo, hi]`` implies ``t(v) in [t(lo), t(hi)]`` and a file
    whose stored partition value falls outside that transformed window
    cannot contain a matching row. bucket[N] is not monotonic and never
    participates in range pruning.
    """
    meta = load_metadata(table_path)
    files = _plan_files(table_path, meta, snapshot_id, content)
    if not (partition_filter or range_filter):
        return files
    field_types = {
        f["name"]: f["type"] for f in current_schema(meta)["fields"]
        if isinstance(f["type"], str)
    }
    # spec-id -> source column -> its partition fields (name + transform)
    spec_fields_by_src: dict[int, dict[str, list[dict]]] = {}
    for s in meta["partition-specs"]:
        by_src: dict[str, list[dict]] = {}
        for f in _resolved_spec_fields(meta, s):
            by_src.setdefault(f["_source_name"], []).append(f)
        spec_fields_by_src[s["spec-id"]] = by_src

    def _bounds_admit(f: DataFile, col: str, lo, hi) -> bool:
        t = field_types.get(col)
        if t is None or f.lower_bounds is None or f.upper_bounds is None:
            return True
        ls, us = f.lower_bounds.get(col), f.upper_bounds.get(col)
        if ls is None or us is None:
            return True
        fl, fu = _coerce_bound(t, ls), _coerce_bound(t, us)
        return not ((hi is not None and fl > hi)
                    or (lo is not None and fu < lo))

    def _admit(f: DataFile) -> bool:
        for k, v in (partition_filter or {}).items():
            pfs = spec_fields_by_src.get(f.spec_id, {}).get(k)
            if pfs:
                # every partition field over this source is a necessary
                # condition: transform(v) must equal the stored value
                # (stored as strings in manifests; compare stringified)
                for pf in pfs:
                    want = apply_transform_to_value(
                        v, pf["transform"], pf["_source_type"]
                    )
                    if (f.partition or {}).get(pf["name"]) != str(want):
                        return False
            elif not _bounds_admit(f, k, v, v):
                return False
        for k, (lo, hi) in (range_filter or {}).items():
            if not _bounds_admit(f, k, lo, hi):
                return False
            for pf in spec_fields_by_src.get(f.spec_id, {}).get(k) or []:
                tr = pf["transform"]
                if tr.startswith("bucket["):
                    continue  # not monotonic: unusable for ranges
                stored = (f.partition or {}).get(pf["name"])
                if stored is None:
                    continue
                # lexical compare for string-valued transforms (identity
                # and truncate-on-string are prefix/id maps, monotone
                # under lexicographic order); numeric otherwise
                as_str = pf["_source_type"] == "string"
                sv = stored if as_str else int(stored)
                if lo is not None:
                    tlo = apply_transform_to_value(
                        lo, tr, pf["_source_type"]
                    )
                    if sv < (tlo if as_str else int(tlo)):
                        return False
                if hi is not None:
                    thi = apply_transform_to_value(
                        hi, tr, pf["_source_type"]
                    )
                    if sv > (thi if as_str else int(thi)):
                        return False
        return True

    return [f for f in files if _admit(f)]


def _scan_with_partitions(spark, meta: dict, files: list[DataFile],
                          need_meta: bool, schema: dict | None = None):
    """One logical scan over planned data files. Partitioned files group
    by (write spec, partition value) — data files do not store their
    spec's partition columns; the values come back from manifest metadata
    (identity semantics) — and the per-group scans union. After pruning
    this is usually ONE group; with partition evolution each file uses
    the spec it was WRITTEN under, so mixed-era snapshots read correctly.
    ``need_meta`` attaches ``__fp``/``__pos`` inside each scan (metadata
    columns only exist at the FileScan, not across unions). ``schema``
    overrides the read schema — the WRITE-TIME schema of this file group
    when the table has evolved."""
    from pyspark.sql import functions as F

    schema = schema or current_schema(meta)
    schema_fields = schema["fields"]
    full_ddl = iceberg_to_spark_ddl(schema)
    order = [f["name"] for f in schema_fields] + (
        ["__fp", "__pos"] if need_meta else []
    )

    def attach_meta(df):
        if not need_meta:
            return df
        return df.withColumns({
            "__fp": F.regexp_replace(
                F.col("_metadata.file_path"), "^file:", ""
            ),
            "__pos": F.col("_metadata.row_index"),
        })

    by_spec: dict[int, list[DataFile]] = {}
    for f in files:
        by_spec.setdefault(f.spec_id, []).append(f)

    parts = []
    for sid, sfiles in sorted(by_spec.items()):
        # only IDENTITY fields remove their source column from data files
        # (Spark partitionBy layout); transform fields (bucket/truncate/
        # temporal) are derived layout columns — their sources stay in the
        # files, so nothing needs restoring for them
        id_cols = [
            f["name"] for f in _spec_by_id(meta, sid)["fields"]
            if f["transform"] == "identity"
        ]
        if not id_cols:
            parts.append(attach_meta(
                spark.read.schema(full_ddl)
                .parquet(*[f.file_path for f in sfiles])
            ).select(*order))
            continue
        reduced = {
            "type": "struct", "schema-id": 0,
            "fields": [f for f in schema_fields
                       if f["name"] not in id_cols],
        }
        reduced_ddl = iceberg_to_spark_ddl(reduced)
        groups: dict[tuple, list[str]] = {}
        for f in sfiles:
            key = tuple((f.partition or {}).get(c) for c in id_cols)
            groups.setdefault(key, []).append(f.file_path)
        # NULL partition values (None) sort after strings deterministically
        for key, paths in sorted(
            groups.items(),
            key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
        ):
            g = attach_meta(spark.read.schema(reduced_ddl).parquet(*paths))
            for c, v in zip(id_cols, key):
                g = g.withColumn(c, F.lit(v).cast("string"))
            parts.append(g.select(*order))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_table(
    spark,
    table_path: str,
    snapshot_id: int | None = None,
    branch: str | None = None,
    partition_filter: dict | None = None,
    range_filter: dict | None = None,
):
    """Snapshot scan -> one Spark parquet read over the planned files,
    with position deletes applied merge-on-read.

    The planned file list is metadata-sized; token arrays flow through
    Spark's vectorized parquet reader exactly as a native table would —
    every downstream operator (encode pipeline, dedup, search) is
    unchanged. When the snapshot carries position-delete files (spec
    content=1: parquet rows of ``(file_path, pos)``), the scan projects
    ``_metadata.file_path``/``_metadata.row_index`` and LEFT-ANTI joins
    the delete rows — a broadcast-sized join in practice (AQE picks it),
    exactly Iceberg's v2 MoR read. The spec sequence rule is honored:
    a delete file applies only to data files whose data sequence number
    is <= the delete file's (enforced by pre-filtering delete rows
    against the metadata-sized file->seq map)."""
    from pyspark.sql import functions as F

    meta = load_metadata(table_path)
    if branch is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id OR branch, not both")
        ref = meta.get("refs", {}).get(branch)
        if ref is None:
            raise ValueError(f"unknown branch {branch!r}")
        snapshot_id = ref["snapshot-id"]
    files = plan_scan(table_path, snapshot_id,
                      partition_filter=partition_filter,
                      range_filter=range_filter)
    cur = current_schema(meta)
    ddl = iceberg_to_spark_ddl(cur)

    # metadata pruning above is an optimization; the same predicates run
    # as residual data filters (Spark pushes them into the parquet scan),
    # so files an old spec or missing bounds couldn't prune stay exact
    def _residual(df):
        for k, v in (partition_filter or {}).items():
            df = df.filter(F.col(k) == v)
        for k, (lo, hi) in (range_filter or {}).items():
            if lo is not None:
                df = df.filter(F.col(k) >= lo)
            if hi is not None:
                df = df.filter(F.col(k) <= hi)
        return df

    if not files:
        return spark.createDataFrame([], ddl)
    pos_dels = plan_scan(table_path, snapshot_id, content=POSITION_DELETES)
    eq_dels = plan_scan(table_path, snapshot_id, content=EQUALITY_DELETES)
    need_meta = bool(pos_dels or eq_dels)

    # column resolution BY FIELD ID: group data files by the schema they
    # were written under (snapshot schema-id via the file's data sequence
    # number); each group scans with its write-time physical names, then
    # projects to the current schema — renamed fields read the old name,
    # fields added later backfill NULL. Single-schema tables (the common
    # case) keep the one-scan fast path unchanged.
    seq_to_sid = {
        s["sequence-number"]: s.get("schema-id", 0)
        for s in meta["snapshots"]
    }
    cur_sid = cur.get("schema-id", 0)
    by_sid: dict[int, list[DataFile]] = {}
    for f in files:
        by_sid.setdefault(seq_to_sid.get(f.sequence_number, 0), []).append(f)
    if set(by_sid) <= {cur_sid}:
        df = _scan_with_partitions(spark, meta, files, need_meta)
    else:
        parts = []
        for sid, group in sorted(by_sid.items()):
            ws = _schema_by_id(meta, sid)
            wname = {fld["id"]: fld["name"] for fld in ws["fields"]}
            g = _scan_with_partitions(spark, meta, group, need_meta,
                                      schema=ws)
            proj = []
            for fld in cur["fields"]:
                wn = wname.get(fld["id"])
                if wn is None:
                    proj.append(
                        F.lit(None).cast(_spark_type_of(fld))
                        .alias(fld["name"])
                    )
                else:
                    proj.append(F.col(wn).alias(fld["name"]))
            if need_meta:
                proj += [F.col("__fp"), F.col("__pos")]
            parts.append(g.select(*proj))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
    if not need_meta:
        return _residual(df)
    cols = [c for c in df.columns if not c.startswith("__")]
    # per-data-file sequence numbers (metadata-sized map) — both delete
    # kinds gate on them
    seq_df = spark.createDataFrame(
        [(f.file_path, f.sequence_number) for f in files],
        "__fp string, __data_seq bigint",
    )
    df = df.join(F.broadcast(seq_df), "__fp")

    if pos_dels:
        # delete-file seq comes from ITS manifest entry (spec), joined in
        # via the metadata-sized (delete file -> seq) map
        del_df = spark.read.parquet(*[d.file_path for d in pos_dels]).select(
            F.regexp_replace("file_path", "^file:", "").alias("__dfp"),
            F.col("pos").alias("__dpos"),
            F.regexp_replace(F.col("_metadata.file_path"), "^file:", "")
            .alias("__delfile"),
        )
        dseq_df = spark.createDataFrame(
            [(d.file_path, d.sequence_number) for d in pos_dels],
            "__delfile string, __delete_seq bigint",
        )
        del_df = del_df.join(F.broadcast(dseq_df), "__delfile")
        # position deletes apply to data files with data seq <= delete seq
        df = df.join(
            del_df,
            (df["__fp"] == del_df["__dfp"])
            & (df["__pos"] == del_df["__dpos"])
            & (df["__data_seq"] <= del_df["__delete_seq"]),
            "left_anti",
        )

    if eq_dels:
        id_to_name = {f["id"]: f["name"] for f in cur["fields"]}
        # group delete files by (equality column set, write schema): the
        # parquet columns carry write-time PHYSICAL names, the comparison
        # runs against current names — same field-id resolution as data
        by_ids: dict[tuple[tuple[int, ...], int], list[DataFile]] = {}
        for d in eq_dels:
            dsid = seq_to_sid.get(d.sequence_number, 0)
            by_ids.setdefault(
                (tuple(d.equality_ids or ()), dsid), []
            ).append(d)
        for (ids, dsid), dfiles in sorted(by_ids.items()):
            names = [id_to_name[i] for i in ids]
            dname = {
                fld["id"]: fld["name"]
                for fld in _schema_by_id(meta, dsid)["fields"]
            }
            eq_df = spark.read.parquet(
                *[d.file_path for d in dfiles]
            ).select(
                *[
                    F.col(dname[i]).alias(f"__eq_{id_to_name[i]}")
                    for i in ids
                ],
                F.regexp_replace(F.col("_metadata.file_path"), "^file:", "")
                .alias("__delfile"),
            )
            eseq_df = spark.createDataFrame(
                [(d.file_path, d.sequence_number) for d in dfiles],
                "__delfile string, __eq_seq bigint",
            )
            eq_df = eq_df.join(F.broadcast(eseq_df), "__delfile")
            # equality deletes apply only to data files with data seq
            # STRICTLY LESS than the delete file's (spec)
            cond = df["__data_seq"] < eq_df["__eq_seq"]
            for n in names:
                cond = cond & (df[n] == eq_df[f"__eq_{n}"])
            df = df.join(eq_df, cond, "left_anti")

    return _residual(df.select(*cols))


def commit_equality_deletes(
    spark, table_path: str, values_df, equality_cols: list[str]
) -> dict:
    """Commit row-level deletes BY VALUE (spec content=2): a parquet file
    of the equality columns; at read time every data file written BEFORE
    this commit drops rows matching any delete row. The natural form for
    dedup/retention pipelines ('remove these doc_ids wherever they are')
    — no position scan needed at delete time, the cost moves to reads
    until the next rewrite_data_files."""
    meta = load_metadata(table_path)
    seq = meta["last-sequence-number"] + 1
    name_to_id = {f["name"]: f["id"] for f in current_schema(meta)["fields"]}
    ids = [name_to_id[c] for c in equality_cols]
    dd = os.path.join(table_path, "data", f"deletes-seq={seq}")
    os.makedirs(dd, exist_ok=True)
    path = os.path.join(
        dd, f"eqdelete-{_det_uuid(f'{table_path}:eqdel:{seq}')}.parquet"
    )
    pdf = values_df.select(*equality_cols).toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    live = _plan_files(
        table_path, meta, meta["current-snapshot-id"], content=None
    )
    new = DataFile(path, len(pdf), os.path.getsize(path),
                   content=EQUALITY_DELETES, equality_ids=ids)
    return _commit(table_path, live + [new], [], "delete")


def commit_position_deletes(
    table_path: str, delete_rows: list[tuple[str, int]]
) -> dict:
    """Commit row-level deletes as a v2 position-delete file: parquet of
    ``(file_path, pos)`` sorted by that pair (spec ordering), registered
    through a content=1 manifest. Existing data/delete files carry over.
    This is the SMALL-SET form (the driver writes one delete file; use it
    for explicit, bounded row lists); predicate-driven deletes go through
    :func:`delete_where`, whose workers write the delete fragments so
    matched positions never reach the driver."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = load_metadata(table_path)
    seq = meta["last-sequence-number"] + 1
    rows = sorted(delete_rows)
    tbl = pa.table({
        "file_path": pa.array([r[0] for r in rows], type=pa.string()),
        "pos": pa.array([r[1] for r in rows], type=pa.int64()),
    })
    dd = os.path.join(table_path, "data", f"deletes-seq={seq}")
    os.makedirs(dd, exist_ok=True)
    path = os.path.join(dd, f"delete-{_det_uuid(f'{table_path}:del:{seq}')}.parquet")
    pq.write_table(tbl, path)
    live = _plan_files(
        table_path, meta, meta["current-snapshot-id"], content=None
    )
    new = DataFile(path, len(rows), os.path.getsize(path),
                   content=POSITION_DELETES)
    return _commit(table_path, live + [new], [], "delete")


def delete_where(spark, table_path: str, predicate: str) -> dict:
    """Row-level DELETE WHERE with a DISTRIBUTED position-delete writer:
    matching rows' (file, position) pairs are found via the metadata
    columns and each scan partition writes its own spec-sorted
    position-delete parquet fragment worker-side (deterministic name from
    the commit sequence + partition id, atomic tmp+rename — the
    ``parquet_direct`` sink pattern), so matched positions NEVER reach the
    driver: a predicate-wave delete (e.g. a GDPR purge by domain) commits
    millions of positions with only one metadata row per fragment
    crossing to the driver. Empty partitions write nothing; the single
    manifest commit registers every fragment (the reader already unions
    all content=1 files)."""
    from collections.abc import Iterator as _It

    import pyarrow as pa
    from pyspark.sql import functions as F

    files = plan_scan(table_path)
    meta = load_metadata(table_path)
    seq = meta["last-sequence-number"] + 1
    dd = os.path.join(table_path, "data", f"deletes-seq={seq}")
    os.makedirs(dd, exist_ok=True)
    token = _det_uuid(f"{table_path}:del:{seq}")
    df = _scan_with_partitions(spark, meta, files, need_meta=True)
    hits = df.filter(predicate).select(
        F.col("__fp").alias("file_path"),
        F.col("__pos").cast("long").alias("pos"),
    )

    def fn(batches: _It[pa.RecordBatch]) -> _It[pa.RecordBatch]:
        from pyspark import TaskContext

        from .parquet_direct import write_parquet_atomic

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx else 0
        parts = [b for b in batches if b.num_rows]
        out_schema = pa.schema([("path", pa.string()), ("n", pa.int64()),
                                ("size", pa.int64())])
        if parts:
            tbl = pa.Table.from_batches(parts).sort_by(
                [("file_path", "ascending"), ("pos", "ascending")]
            )
            path = os.path.join(dd, f"delete-{token}-{part:05d}.parquet")
            write_parquet_atomic(tbl, path)
            yield pa.RecordBatch.from_pydict(
                {"path": [path], "n": [tbl.num_rows],
                 "size": [os.path.getsize(path)]},
                schema=out_schema,
            )

    written = hits.mapInArrow(fn, "path string, n long, size long").collect()
    new = [
        DataFile(r.path, int(r.n), int(r.size), content=POSITION_DELETES)
        for r in written
    ]
    live = _plan_files(
        table_path, meta, meta["current-snapshot-id"], content=None
    )
    return _commit(table_path, live + new, [], "delete")


def incremental_scan(
    spark,
    table_path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
):
    """Incremental (CDC-append) read: rows of data files ADDED strictly
    after ``from_snapshot_id`` up to ``to_snapshot_id`` (default: current).
    File selection is metadata-only — a file is in the increment iff its
    data sequence number lands in ``(seq(from), seq(to)]`` AND the
    snapshot that assigned that sequence number was an ``append`` — so a
    daily consumer reads exactly the new rows, never a table diff.
    Matches Iceberg's IncrementalAppendScan: ``replace`` commits
    (rewrite_data_files) re-add existing rows under a new sequence
    number, so their files are SKIPPED (the rows were already consumed
    from the original append); an ``overwrite`` in the range is
    ambiguous for append-only CDC and raises, as in Iceberg."""
    meta = load_metadata(table_path)
    lo_seq = _snapshot(meta, from_snapshot_id)["sequence-number"]
    hi_seq = _snapshot(meta, to_snapshot_id)["sequence-number"]
    if hi_seq < lo_seq:
        raise ValueError(
            f"to-snapshot seq {hi_seq} precedes from-snapshot seq {lo_seq}"
        )
    seq_op = {
        s["sequence-number"]: s["summary"]["operation"]
        for s in meta["snapshots"]
    }
    for s_seq, op in seq_op.items():
        if lo_seq < s_seq <= hi_seq and op == "overwrite":
            raise ValueError(
                f"incremental range contains an overwrite commit "
                f"(sequence {s_seq}); append-scan semantics undefined"
            )
    files = [
        f for f in _plan_files(table_path, meta, to_snapshot_id)
        if f.sequence_number is not None
        and lo_seq < f.sequence_number <= hi_seq
        and seq_op.get(f.sequence_number) == "append"
    ]
    if not files:
        return spark.createDataFrame(
            [], iceberg_to_spark_ddl(current_schema(meta))
        )
    return _scan_with_partitions(spark, meta, files, need_meta=False)


def files_df(spark, table_path: str, snapshot_id: int | None = None):
    """The ``files`` metadata table (SELECT * FROM t.files analog): one
    row per live data/delete file of a snapshot, with partition values,
    spec id, sequence number, and the recorded column bounds."""
    import json as _json

    meta = load_metadata(table_path)
    rows = [
        {
            "content": f.content,
            "file_path": f.file_path,
            "record_count": f.record_count,
            "file_size_in_bytes": f.file_size_in_bytes,
            "sequence_number": f.sequence_number,
            "spec_id": f.spec_id,
            "partition": _json.dumps(f.partition or {}, sort_keys=True),
            "lower_bounds": _json.dumps(f.lower_bounds or {},
                                        sort_keys=True),
            "upper_bounds": _json.dumps(f.upper_bounds or {},
                                        sort_keys=True),
        }
        for f in _plan_files(table_path, meta, snapshot_id, content=None)
    ]
    return spark.createDataFrame(
        rows,
        "content int, file_path string, record_count long, "
        "file_size_in_bytes long, sequence_number long, spec_id int, "
        "partition string, lower_bounds string, upper_bounds string",
    )


def manifests_df(spark, table_path: str, snapshot_id: int | None = None):
    """The ``manifests`` metadata table: one row per manifest of a
    snapshot's manifest list."""
    meta = load_metadata(table_path)
    snap = _snapshot(meta, snapshot_id)
    with open(snap["manifest-list"], "rb") as fh:
        _, _, manifests = A.read_ocf(fh.read())
    rows = [
        {
            "path": m["manifest_path"],
            "length": m["manifest_length"],
            "partition_spec_id": m["partition_spec_id"],
            "content": m["content"],
            "sequence_number": m["sequence_number"],
            "min_sequence_number": m["min_sequence_number"],
            "added_snapshot_id": m["added_snapshot_id"],
            "added_files_count": m["added_files_count"],
            "existing_files_count": m["existing_files_count"],
            "deleted_files_count": m["deleted_files_count"],
        }
        for m in manifests
    ]
    return spark.createDataFrame(
        rows,
        "path string, length long, partition_spec_id int, content int, "
        "sequence_number long, min_sequence_number long, "
        "added_snapshot_id long, added_files_count int, "
        "existing_files_count int, deleted_files_count int",
    )


def partitions_df(spark, table_path: str, snapshot_id: int | None = None):
    """The ``partitions`` metadata table: per (spec_id, partition value)
    file/record totals of a snapshot's live data files — the metadata-only
    answer to "how big is each partition"."""
    import json as _json

    meta = load_metadata(table_path)
    agg: dict[tuple[int, str], list[int]] = {}
    for f in _plan_files(table_path, meta, snapshot_id):
        key = (f.spec_id, _json.dumps(f.partition or {}, sort_keys=True))
        cur = agg.setdefault(key, [0, 0, 0])
        cur[0] += 1
        cur[1] += f.record_count
        cur[2] += f.file_size_in_bytes
    rows = [
        {
            "spec_id": sid,
            "partition": part,
            "file_count": v[0],
            "record_count": v[1],
            "total_size_in_bytes": v[2],
        }
        for (sid, part), v in sorted(agg.items())
    ]
    return spark.createDataFrame(
        rows,
        "spec_id int, partition string, file_count long, "
        "record_count long, total_size_in_bytes long",
    )


def snapshots_df(spark, table_path: str):
    """The snapshots metadata table (SELECT * FROM t.snapshots analog)."""
    meta = load_metadata(table_path)
    rows = [
        {
            "snapshot_id": s["snapshot-id"],
            "parent_id": s.get("parent-snapshot-id"),
            "sequence_number": s["sequence-number"],
            "operation": s["summary"]["operation"],
            "added_files": int(s["summary"].get("added-data-files", "0")),
            "deleted_files": int(s["summary"].get("deleted-data-files", "0")),
        }
        for s in meta["snapshots"]
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, sequence_number long, "
        "operation string, added_files int, deleted_files int",
    )


def rewrite_data_files(spark, table_path: str) -> dict:
    """Compaction (the rewrite_data_files action): read the current
    snapshot MERGE-ON-READ, write the surviving rows as fresh data files,
    and commit a REPLACE snapshot that drops every old data file AND every
    position-delete file. Content is bit-identical (time travel keeps the
    old layout); afterwards the table has zero live deletes, so the
    file-level ``iceberg://`` fused-encode path accepts it again — the
    standard maintenance step between MoR deletes and bulk scans.

    The rewrite itself is one distributed Spark write; only footers of the
    new files touch the driver (same bounded commit contract as
    :func:`append_dataframe`)."""
    meta = load_metadata(table_path)
    cur = _plan_files(
        table_path, meta, meta["current-snapshot-id"], content=None
    )
    df = read_table(spark, table_path)  # deletes applied
    seq = meta["last-sequence-number"] + 1
    data_dir = os.path.join(table_path, "data", f"seq={seq}-rewrite")
    # compaction rewrites under the DEFAULT spec — after partition
    # evolution this is also the migration step that moves old-spec files
    # into the new layout
    spec = _default_spec(meta)
    new_files = _write_data_files(df, data_dir, meta, spec)
    return _commit(table_path, new_files, cur, "replace")


def expire_snapshots(table_path: str, keep_last: int = 1) -> dict:
    """Snapshot expiration (the expire_snapshots maintenance action): keep
    the newest ``keep_last`` snapshots plus anything a ref points at; drop
    the rest from metadata and DELETE files no surviving snapshot
    references (manifest lists, manifests, data/delete files). Bounds the
    metadata tree and reclaims storage — time travel is traded away for
    exactly the expired range, like real Iceberg."""
    meta = load_metadata(table_path)
    snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])
    keep_ids = {s["snapshot-id"] for s in snaps[-keep_last:]}
    keep_ids |= {r["snapshot-id"] for r in meta.get("refs", {}).values()}
    survivors = [s for s in snaps if s["snapshot-id"] in keep_ids]
    expired = [s for s in snaps if s["snapshot-id"] not in keep_ids]
    if not expired:
        return meta

    def _referenced(snapshots: list[dict]) -> tuple[set, set]:
        metas, datas = set(), set()
        for s in snapshots:
            metas.add(s["manifest-list"])
            with open(s["manifest-list"], "rb") as fh:
                _, _, manifests = A.read_ocf(fh.read())
            for m in manifests:
                metas.add(m["manifest_path"])
                with open(m["manifest_path"], "rb") as fh:
                    _, _, entries = A.read_ocf(fh.read())
                for e in entries:
                    datas.add(e["data_file"]["file_path"])
        return metas, datas

    live_meta, live_data = _referenced(survivors)
    dead_meta, dead_data = _referenced(expired)
    for p in sorted((dead_meta - live_meta) | (dead_data - live_data)):
        if os.path.exists(p):
            os.remove(p)
    version = _read_version(table_path) + 1
    meta["snapshots"] = survivors
    meta["snapshot-log"] = [
        e for e in meta["snapshot-log"] if e["snapshot-id"] in keep_ids
    ]
    meta["last-updated-ms"] = _EPOCH_MS + version
    _write_metadata(table_path, meta, version)
    return meta


# ---------------------------------------------------------------------------
# Spark write entry: DataFrame -> data files -> commit
# ---------------------------------------------------------------------------

def append_dataframe(
    spark,
    df,
    table_path: str,
    branch: str = "main",
    partition_by: list[str] | None = None,
) -> dict:
    """Write ``df`` as parquet data files and commit them as one APPEND
    snapshot. The write is fully distributed (Spark parquet sink into a
    staging dir); the commit reads only the new files' FOOTERS on the
    driver — bounded by the files of this commit, the same scale contract
    as real Iceberg's commit path (which gets counts from the writer
    tasks; a worker-side stats sink is the obvious upgrade, as
    ``sources/parquet_direct`` does for the native blocks store)."""
    if not os.path.exists(os.path.join(_meta_dir(table_path), "version-hint.text")):
        create_table(table_path, df.schema, partition_by)
    meta = load_metadata(table_path)
    want = {f["name"] for f in current_schema(meta)["fields"]}
    if set(df.columns) != want:
        raise ValueError(
            f"append columns {sorted(df.columns)} != current schema "
            f"{sorted(want)} (did the table evolve?)"
        )
    spec = _default_spec(meta)
    if partition_by is not None:
        want_fields, _ = _spec_fields_from_terms(
            current_schema(meta), partition_by,
            {
                (f["source-id"], f["transform"]): f["field-id"]
                for s in meta["partition-specs"] for f in s["fields"]
            },
            meta.get("last-partition-id", 999),
        )
        if [
            (f["source-id"], f["transform"]) for f in want_fields
        ] != [
            (f["source-id"], f["transform"]) for f in spec["fields"]
        ]:
            raise ValueError(
                f"table's default spec partitions by "
                f"{[f['name'] for f in spec['fields']]}; to change the "
                f"layout call evolve_partition_spec({partition_by!r})"
            )
    seq = meta["last-sequence-number"] + 1
    data_dir = os.path.join(table_path, "data", f"seq={seq}")
    new_files = _write_data_files(df, data_dir, meta, spec)
    return commit_append(table_path, new_files, branch)


def _serialize_bound(v) -> str | None:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float, str)):
        return str(v)
    return None  # unsupported footer-stat type -> no bound for the column


def _footer_bounds(md) -> tuple[dict | None, dict | None]:
    """Per-file column bounds from parquet row-group statistics; a column
    missing stats in ANY row group gets no bound (conservative)."""
    lows: dict = {}
    highs: dict = {}
    bad: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested (list/struct leaves) — skip
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            if name in lows:
                lows[name] = min(lows[name], st.min)
                highs[name] = max(highs[name], st.max)
            else:
                lows[name], highs[name] = st.min, st.max
    lo_s, hi_s = {}, {}
    for name in lows:
        if name in bad:
            continue
        ls, hs = _serialize_bound(lows[name]), _serialize_bound(highs[name])
        if ls is not None and hs is not None:
            lo_s[name], hi_s[name] = ls, hs
    return (lo_s or None), (hi_s or None)


def _resolved_spec_fields(meta: dict, spec: dict) -> list[dict]:
    """Spec fields + ``_source_name``/``_source_type`` resolved from the
    current schema (source-ids are stable across renames)."""
    by_id = {f["id"]: f for f in current_schema(meta)["fields"]}
    out = []
    for f in spec["fields"]:
        src = by_id[f["source-id"]]
        out.append({**f, "_source_name": src["name"],
                    "_source_type": src["type"]})
    return out


def _write_data_files(
    df, data_dir: str, meta: dict, spec: dict
) -> list[DataFile]:
    """Distributed parquet write (partitionBy for partitioned specs) +
    footer walk of the new files; partition values come back from the
    field=value path segments (identity values verbatim; transform
    values are the derived columns the writer computed — Catalyst for
    truncate/temporal, vectorized murmur3 for bucket) and column bounds
    from the row-group statistics. Footer reads are bounded by THIS
    commit's files (real Iceberg collects the same stats from writer
    tasks). Identity fields remove their source column from data files
    (Spark partitionBy layout); transform fields keep it — derived
    partition columns are layout-only and never part of the table
    schema."""
    import pyarrow.parquet as pq

    fields = _resolved_spec_fields(meta, spec)
    writer_df = df
    part_cols = []
    for f in fields:
        if f["transform"] == "identity":
            part_cols.append(f["_source_name"])
        else:
            writer_df = writer_df.withColumn(
                f["name"], _transform_column(df, f, f["_source_type"])
            )
            part_cols.append(f["name"])
    writer = writer_df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(data_dir)
    name_by_part = {p: f["name"] for p, f in zip(part_cols, fields)}

    # Spark URL-escapes special characters in partition directory names
    # (space -> %20, ':' -> %3A, '%' -> %25) and writes NULL values as
    # __HIVE_DEFAULT_PARTITION__. Manifest partition values must hold the
    # LOGICAL value, or plan_scan's transform-equality and lexicographic
    # range compares would match escaped text against unescaped filter
    # values and silently prune files that DO contain matching rows.
    from urllib.parse import unquote

    def _unescape(v: str):
        return None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)

    new_files = []
    for dp, _dirs, names in sorted(os.walk(data_dir)):
        rel = os.path.relpath(dp, data_dir)
        pvals = {
            k: _unescape(v)
            for k, v in (
                seg.split("=", 1) for seg in rel.split(os.sep) if "=" in seg
            )
        }
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(dp, name)
            md = pq.read_metadata(path)
            lo, hi = _footer_bounds(md)
            new_files.append(DataFile(
                path, md.num_rows, os.path.getsize(path),
                partition={
                    name_by_part[p]: pvals[p] for p in part_cols
                } if part_cols else None,
                spec_id=spec["spec-id"],
                lower_bounds=lo, upper_bounds=hi,
            ))
    return new_files
