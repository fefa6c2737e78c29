"""Dataset: a lazy DataFrame + accumulated change log (SURVEY.md §3.1).

The reference's core "transaction" is: load CSV → N interactive operators
mutate a pandas frame in place, each appending a change string → save as
{base}_v{N}.csv with ``# META`` lineage (ref /root/reference/utils/
meta_tracker.py:29-153; /root/reference/checking_data_formats_ui.py:284-628).

Spark-native shape: ``Dataset`` wraps an immutable lazy DataFrame and a
change-string list. Every operator application returns a NEW Dataset whose
logical plan Catalyst keeps optimizing end-to-end (the change log is driver
metadata, zero execution cost). ``save`` commits one version to the
VersionedDataset layer; ``load`` resumes from any version with its full
history.

    ds = Dataset.load_csv(spark, "in.csv")
    ds = (ds.apply(FL.drop_columns, ["junk"], describe="dropped junk")
            .apply(I.impute_mean, "age", describe="imputed mean age"))
    ds.save(root, "people")           # v0 (or next) + _meta.json lineage

The pandas version re-reads the CSV in every module and re-executes eagerly;
here the whole chain is ONE Catalyst plan — filters/pruning push into the
scan across operator boundaries for free (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..sources.csv_io import read_csv
from ..sources.versioned import VersionedDataset


@dataclass(frozen=True)
class Dataset:
    df: DataFrame
    changes: tuple[str, ...] = field(default_factory=tuple)
    base_version: int | None = None  # version this chain started from

    # ---------------------------------------------------------------- create
    @staticmethod
    def from_df(df: DataFrame) -> "Dataset":
        return Dataset(df=df)

    @staticmethod
    def load_csv(spark: SparkSession, path: str, **kwargs: Any) -> "Dataset":
        return Dataset(df=read_csv(spark, path, **kwargs), changes=(f"imported {path}",))

    @staticmethod
    def load(spark: SparkSession, root: str, base: str, version: int | None = None) -> "Dataset":
        vd = VersionedDataset(spark, root, base)
        v = vd.latest_version() if version is None else version
        return Dataset(df=vd.read(v), base_version=v)

    # ---------------------------------------------------------------- apply
    def apply(
        self,
        op: Callable[..., DataFrame],
        *args: Any,
        describe: str | None = None,
        **kwargs: Any,
    ) -> "Dataset":
        """Apply a DataFrame->DataFrame operator, recording a change string.
        The default description is the operator name + its args."""
        out = op(self.df, *args, **kwargs)
        if not isinstance(out, DataFrame):
            raise TypeError(
                f"{getattr(op, '__name__', op)!r} returned {type(out).__name__}; "
                "use apply_multi for operators returning multiple frames"
            )
        parts = [repr(a) for a in args] + [f"{k}={v!r}" for k, v in kwargs.items()]
        desc = describe or f"{getattr(op, '__name__', 'op')}({', '.join(parts)})"
        return Dataset(out, self.changes + (desc,), self.base_version)

    def transform(self, fn: Callable[[DataFrame], DataFrame], describe: str) -> "Dataset":
        """Inline lambda variant of apply."""
        return Dataset(fn(self.df), self.changes + (describe,), self.base_version)

    # ---------------------------------------------------------------- save
    def save(
        self,
        root: str,
        base: str,
        partition_by: list[str] | None = None,
    ):
        """Commit one version; the accumulated change log becomes the
        version's lineage metadata (the Spark-native ``# META`` line).
        A chain resumed from an older version records that origin as the
        first change line (r10 review: the versioned layer's parent
        pointer is always the latest version, so without this line a
        resumed chain's true ancestry was lost from the lineage)."""
        vd = VersionedDataset(self.df.sparkSession, root, base)
        changes = list(self.changes)
        if self.base_version is not None:
            changes = [f"resumed from v{self.base_version}"] + changes
        return vd.write_version(self.df, changes, partition_by)

    def save_pair(
        self,
        root: str,
        base: str,
        test_df: DataFrame,
        partition_by: list[str] | None = None,
    ):
        """S7 — paired train/test sink under ONE version commit: the balanced
        train and untouched test share a version by construction
        (ref /root/reference/preprocessing/data_balancing/
        data_balancing_list_method_ui.py:298-331)."""
        spark = self.df.sparkSession
        train_vd = VersionedDataset(spark, root, f"{base}_train")
        test_vd = VersionedDataset(spark, root, f"{base}_test")
        # align the two version counters before committing
        tv = train_vd.latest_version()
        ev = test_vd.latest_version()
        if tv != ev:
            raise ValueError(
                f"train/test version counters diverged (v{tv} vs v{ev}) — "
                "the paired layout requires lock-step commits"
            )
        info_train = train_vd.write_version(self.df, list(self.changes), partition_by)
        try:
            info_test = test_vd.write_version(
                test_df,
                ["untouched test partner of train v%d" % info_train.version],
                partition_by,
            )
        except Exception as e:
            # the pair is two physical commits; a test-side failure after
            # the train commit leaves an ORPHAN train version that makes
            # every future save_pair raise on the counter check — name it
            # and the recovery instead of failing opaquely (r10 review)
            raise RuntimeError(
                f"save_pair: test write failed AFTER train v{info_train.version} "
                f"committed under {root}/{base}_train — delete that orphan "
                "version directory (and its _meta.json) to realign the "
                "paired counters, then retry"
            ) from e
        return info_train, info_test
