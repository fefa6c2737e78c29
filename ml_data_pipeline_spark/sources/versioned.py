"""Versioned Parquet datasets with lineage metadata (SURVEY.md §1.2, §2.1 S6-S9).

The reference embeds lineage as ``# META: vN: <changes>`` comment lines in
each saved CSV and encodes the version in the filename ``{base}_v{N}.csv``
(ref /root/reference/utils/meta_tracker.py:8-17,66-101,132-153;
/root/reference/utils/dataset_version_checker.py:7-26). The Spark-native
equivalent is a directory-per-version Parquet layout:

    {root}/{base}/v{N}/        ← parquet data (partitioned, splittable)
    {root}/{base}/v{N}/_meta.json  ← {version, changes[], parent, base}

Parquet keeps column stats + pushdown at 100 TB; the JSON sidecar is pure
driver-side metadata (a few KB). Version commits are atomic-enough via
write-then-rename-free layout: a version dir is only discoverable once
_meta.json lands (written last).

The train/test version gate (T6, ref /root/reference/utils/
dataset_version_checker.py:29-122) compares base + version of two datasets
before paired operations.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"^v(\d+)$")
# reference filename convention, still accepted for CSV interchange
_FILE_VERSION_RE = re.compile(r"_v(\d+)(?:\.[A-Za-z0-9]+)?$")


@dataclass
class VersionInfo:
    version: int
    changes: list[str] = field(default_factory=list)
    parent: int | None = None
    base: str = ""

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "changes": self.changes,
                "parent": self.parent,
                "base": self.base,
            },
            indent=2,
        )

    @staticmethod
    def from_json(s: str) -> "VersionInfo":
        d = json.loads(s)
        return VersionInfo(
            version=int(d["version"]),
            changes=list(d.get("changes", [])),
            parent=d.get("parent"),
            base=d.get("base", ""),
        )


def parse_file_version(name: str) -> int | None:
    """Reference-compatible ``{base}_v{N}.csv`` version parse
    (ref /root/reference/utils/dataset_version_checker.py:7-26)."""
    m = _FILE_VERSION_RE.search(name)
    return int(m.group(1)) if m else None


def strip_file_version(name: str) -> str:
    """Base name with the ``_vN`` suffix and extension removed."""
    name = re.sub(r"\.[A-Za-z0-9]+$", "", name.rsplit("/", 1)[-1])
    return re.sub(r"_v\d+$", "", name)


def check_paired_versions(train_name: str, test_name: str) -> tuple[bool, str]:
    """T6 — train/test gate: same base, same version
    (ref /root/reference/utils/dataset_version_checker.py:29-122)."""
    tb, eb = strip_file_version(train_name), strip_file_version(test_name)
    # the reference names pairs {base}_train_vN / {base}_test_vN
    tb = re.sub(r"_(train|test)$", "", tb)
    eb = re.sub(r"_(train|test)$", "", eb)
    tv, ev = parse_file_version(train_name), parse_file_version(test_name)
    if tb != eb:
        return False, f"base mismatch: {tb!r} != {eb!r}"
    if tv is None or ev is None:
        return False, "missing _vN version suffix"
    if tv != ev:
        return False, f"version mismatch: v{tv} != v{ev}"
    return True, f"ok: {tb} v{tv}"


class VersionedDataset:
    """Directory-per-version Parquet dataset with a JSON lineage sidecar.

    Uses the Hadoop FS API through the active SparkSession so the same code
    works on local paths, HDFS, and object stores (s3a/gs/abfs) — no direct
    ``os`` filesystem calls.
    """

    def __init__(self, spark: SparkSession, root: str, base: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.base = base
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    # ---------------------------------------------------------------- fs
    def _fs(self, path: str):
        p = self._jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self._conf), p

    def _exists(self, path: str) -> bool:
        fs, p = self._fs(path)
        return fs.exists(p)

    def _write_text(self, path: str, text: str, overwrite: bool = True) -> None:
        fs, p = self._fs(path)
        out = fs.create(p, overwrite)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def _delete(self, path: str) -> None:
        fs, p = self._fs(path)
        if fs.exists(p):
            fs.delete(p, True)

    def _read_text(self, path: str) -> str:
        fs, p = self._fs(path)
        stream = fs.open(p)
        try:
            # py4j passes bytearrays by VALUE — readFully(buf) would fill a
            # Java-side copy. IOUtils returns the bytes to Python instead.
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    # ---------------------------------------------------------------- api
    def _dir(self, version: int) -> str:
        return f"{self.root}/{self.base}/v{version}"

    def versions(self) -> list[int]:
        base_dir = f"{self.root}/{self.base}"
        if not self._exists(base_dir):
            return []
        fs, p = self._fs(base_dir)
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            m = _VERSION_RE.match(name)
            # only versions whose _meta.json landed count as committed
            if m and self._exists(f"{base_dir}/{name}/_meta.json"):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def write_version(
        self,
        df: DataFrame,
        changes: list[str],
        partition_by: list[str] | None = None,
        reclaim_stale: bool = False,
    ) -> VersionInfo:
        """Commit the DataFrame as the next version. Data first, _meta.json
        last — a version without its sidecar is invisible to readers.

        Writer/writer safety: the commit-marker protocol alone only protects
        READERS; two concurrent writers could both pick version N and the
        second would clobber the first's data. A best-effort claim file
        (``.vN.claim``, created with overwrite=false — atomic on HDFS and
        local FS) turns that race into an explicit error. On object stores
        without atomic create-if-absent, run a single writer per base (the
        intended deployment: version commits are a driver-side, once-per-
        pipeline-stage operation).

        ``reclaim_stale`` (r15, for SINGLE-WRITER deployments only — the
        streaming upsert sink's crash-recovery path): a claim whose
        version never committed (_meta.json absent) is a crashed writer's
        leftover; release it and retake instead of erroring. With two live
        writers this reintroduces the clobber race — leave it False
        anywhere concurrency is possible."""
        parent = self.latest_version()
        version = 0 if parent is None else parent + 1
        target = self._dir(version)
        claim = f"{self.root}/{self.base}/.v{version}.claim"
        try:
            self._write_text(claim, "", overwrite=False)
        except Exception as e:  # py4j wraps FileAlreadyExistsException
            stale = reclaim_stale and not self._exists(f"{target}/_meta.json")
            if not stale:
                raise RuntimeError(
                    f"version v{version} of {self.base!r} is already claimed "
                    f"({claim}): either a concurrent writer is committing it "
                    f"(retry after it lands) or a crashed writer left a stale "
                    f"claim (delete the claim file to release it, or pass "
                    f"reclaim_stale=True from a single-writer owner)"
                ) from e
            self._delete(claim)
            self._write_text(claim, "", overwrite=False)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        info = VersionInfo(version=version, changes=list(changes), parent=parent, base=self.base)
        # the marker IS the commit point — write it to a temp name and
        # rename (atomic on local FS and HDFS), so a crash mid-marker
        # cannot leave a half-written _meta.json that readers count as
        # committed (r15: the streaming upsert sink runs this protocol
        # once per micro-batch under kill -9 crash semantics)
        tmp = f"{target}/._meta.json.tmp"
        self._write_text(tmp, info.to_json())
        fs, src = self._fs(tmp)
        _, dst = self._fs(f"{target}/_meta.json")
        if not fs.rename(src, dst):
            raise RuntimeError(f"commit rename failed for {target}/_meta.json")
        return info

    def read(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed versions under {self.root}/{self.base}")
        if not self._exists(f"{self._dir(v)}/_meta.json"):
            raise FileNotFoundError(f"version v{v} not committed for {self.base}")
        return self.spark.read.parquet(self._dir(v))

    def read_evolved(self, versions: list[int] | None = None) -> DataFrame:
        """Read several versions as ONE DataFrame under schema evolution:
        union-by-name with missing columns null-filled (a column added in
        v2 reads as null for v0/v1 rows; a dropped column survives as null
        for the newer rows). The per-version read stays a plain pruned
        parquet scan; a `_version` column records provenance. This is the
        cross-version scan mergeSchema performs inside one directory,
        lifted across the store's commit boundaries."""
        vs = versions if versions is not None else self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed versions under {self.root}/{self.base}")
        out = None
        for v in vs:
            cur = self.read(v).withColumn("_version", F.lit(v))
            out = cur if out is None else out.unionByName(cur, allowMissingColumns=True)
        return out

    def meta(self, version: int | None = None) -> VersionInfo:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed versions under {self.root}/{self.base}")
        return VersionInfo.from_json(self._read_text(f"{self._dir(v)}/_meta.json"))

    def history(self) -> list[VersionInfo]:
        """Full lineage, oldest first — the Spark-native ``# META`` trail."""
        return [self.meta(v) for v in self.versions()]

    def prune(self, keep_last: int = 2) -> list[int]:
        """Drop committed versions older than the newest ``keep_last``
        (their data dirs AND claim files). Storage bound for high-churn
        bases — the streaming upsert sink commits one version per
        micro-batch, so without pruning the table grows by a full copy
        per batch. keep_last >= 2 leaves the previous version as a grace
        copy for any reader that resolved 'latest' just before the most
        recent flip. Returns the pruned version numbers. Single-writer
        only (same caveat as reclaim_stale)."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        doomed = vs[:-keep_last] if len(vs) > keep_last else []
        for v in doomed:
            self._delete(self._dir(v))
            self._delete(f"{self.root}/{self.base}/.v{v}.claim")
        return doomed


def diff_versions(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Row-level diff between two dataset versions keyed by `key_cols`:
    (keys..., change) with change in {'added','removed','changed'} —
    unchanged rows are not emitted. Comparison hashes the non-key columns
    on each side (xxhash64 over a canonical struct), so the shuffle
    carries (key, one long) per side regardless of row width — the diff
    of two 100 TB versions moves keys and hashes, not payloads."""
    from pyspark.sql import functions as F

    others = [c for c in old.columns if c not in key_cols]
    if set(old.columns) != set(new.columns):
        raise ValueError("diff_versions requires identical schemas")
    o = old.select(*key_cols, F.xxhash64(F.struct(*sorted(others))).alias("__h_old"))
    n = new.select(*key_cols, F.xxhash64(F.struct(*sorted(others))).alias("__h_new"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )

def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Column-level schema diff between two dataset versions: one row per
    column with status added / removed / retyped / unchanged and both type
    strings — the pre-flight check before read_evolved or a cross-version
    union (diff_versions compares VALUES and requires identical schemas;
    this explains WHY they differ). Schemas are driver metadata, so the
    diff costs zero cluster work; the result is a DataFrame so it can gate
    pipelines or land in reports like any other table."""
    spark = old.sparkSession
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            rows.append((c, "removed", o[c], None))
        elif c not in o:
            rows.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            rows.append((c, "retyped", o[c], n[c]))
        else:
            rows.append((c, "unchanged", o[c], n[c]))
    return spark.createDataFrame(
        rows, "column string, status string, old_type string, new_type string"
    )


def content_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-independent content fingerprint of a dataset version:
    (n_rows, content_hash) where content_hash = bit_xor of per-row 60-bit
    md5 prefixes over the chosen columns.

    XOR is commutative/associative and cannot overflow, so the
    fingerprint is independent of row order and partitioning, computes
    map-side, and MERGES: xor of shard fingerprints == fingerprint of
    the union — two 100 TB versions compare by exchanging 16 bytes.
    Complements diff_versions above (which says WHAT changed; this says
    WHETHER, at one-aggregate cost). Nulls hash as an explicit sentinel
    so NULL and '' stay distinct; md5 (not xxhash64) keeps the hash
    engine-reproducible.

    Caveat (same class as exact dedup F13): xor cancels PAIRS of
    identical rows — two copies of the same row fingerprint like zero
    copies. Fine for keyed/deduped tables; for multiset semantics feed
    a key column that makes rows unique.

    Canonicalization is LENGTH-PREFIXED per field (r10 review: a bare
    '|' concat collides on field-boundary shifts — ('a|b','c') vs
    ('a','b|c') — and a literal '␀' value was indistinguishable from
    NULL): NULL → 'N|', value v → 'V<len>:<v>|' — unambiguous for any
    content, replayed identically by the DuckDB oracle."""
    cols = cols or df.columns

    def _field(c: str):
        sc = F.col(c).cast("string")
        return F.when(sc.isNull(), F.lit("N|")).otherwise(
            F.concat(F.lit("V"), F.length(sc).cast("string"), F.lit(":"), sc, F.lit("|"))
        )

    canon = F.concat(*[_field(c) for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    # empty input fingerprints as 0 (the xor identity), not NULL — the
    # merge algebra xor(shards) == whole must hold for empty shards too
    # (found by the hypothesis merge property)
    return df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.expr("bit_xor(__h)"), F.lit(0)).alias("content_hash"),
    )
