"""Luminosity tools: golden-JSON masking, integrated-lumi sums, lumi lists.

Reference: lumi_tools/lumi_tools.py — LumiMask :188-270 (numba binary
search over per-run lumi ranges), LumiData :57-186 (keyed sum over
distinct (run, lumi)), LumiList :341-404 (distinct pair accumulation).

Spark shapes:
- LumiMask = interval semi-join. For golden JSONs (KBs) the ranges are a
  LITERAL array and the mask is an ``exists`` HOF — zero shuffle, pure
  codegen. A broadcast-join variant covers pathological range counts.
- LumiData = distinct + broadcast equi-join + sum (SURVEY.md §2.5).
- LumiList = distinct (run, lumi) DataFrame; union() + distinct() is the
  monoid merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class LumiMask:
    """Golden-JSON event mask: keep events whose (run, lumi) falls in any
    accepted range. ``ranges`` = {run: [[lo, hi], ...]} with inclusive
    bounds, as in CMS golden JSONs."""

    def __init__(self, ranges: dict[int, list[list[int]]]):
        self.ranges = {int(r): [(int(lo), int(hi)) for lo, hi in v] for r, v in ranges.items()}

    @classmethod
    def from_json(cls, path: str) -> "LumiMask":
        """Load a REAL CMS certification ("golden") JSON file —
        ``{"<run>": [[lo, hi], ...]}`` with string run keys (reference
        LumiMask.__init__, lumi_tools/lumi_tools.py:188-230)."""
        import json

        with open(path) as f:
            doc = json.load(f)
        return cls({int(r): v for r, v in doc.items()})

    def _flat(self):
        return [
            (run, lo, hi) for run, spans in sorted(self.ranges.items()) for lo, hi in spans
        ]

    def mask(self, run: Column, lumi: Column) -> Column:
        """Boolean Column via literal-array exists (the fast path: golden
        JSONs are small)."""
        triples = F.array(
            *[
                F.struct(F.lit(r).alias("run"), F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
                for r, lo, hi in self._flat()
            ]
        )
        return F.exists(
            triples,
            lambda t: (t["run"] == run) & (lumi >= t["lo"]) & (lumi <= t["hi"]),
        )

    def apply(self, df: DataFrame, run: str = "run", lumi: str = "luminosityBlock") -> DataFrame:
        return df.filter(self.mask(F.col(run), F.col(lumi)))

    def apply_join(self, df: DataFrame, run: str = "run", lumi: str = "luminosityBlock") -> DataFrame:
        """Broadcast range semi-join variant for very large range tables."""
        spark = df.sparkSession
        ranges_df = spark.createDataFrame(
            self._flat(), "r_run long, r_lo long, r_hi long"
        )
        cond = (
            (F.col(run) == F.col("r_run"))
            & (F.col(lumi) >= F.col("r_lo"))
            & (F.col(lumi) <= F.col("r_hi"))
        )
        return df.join(F.broadcast(ranges_df), cond, "left_semi")


class LumiData:
    """Integrated luminosity per (run, lumi) key; ``get_lumi`` sums over
    the DISTINCT keys present in the events (reference get_lumi,
    lumi_tools.py:100-186)."""

    def __init__(self, table: DataFrame):
        """table: DataFrame(run long, lumi long, intlumi double)."""
        self.table = table

    #: 2^18 orbits / 40 MHz machine clock / 3564 bunch positions — the
    #: LHC lumisection wall time (reference seconds_per_lumi_LHC)
    SECONDS_PER_LUMI_LHC = 2**18 / (40079000 / 3564)

    @classmethod
    def from_rows(cls, spark, rows):
        return cls(spark.createDataFrame(rows, "run long, lumi long, intlumi double"))

    @classmethod
    def from_csv(cls, spark, path: str, is_inst_lumi: bool = False) -> "LumiData":
        """Parse a REAL brilcalc ``--byls --output-style csv`` file
        (``run:fill, ls:ls, time, beamstatus, E, delivered, recorded,
        avgpu, source``): columns (0, 1, 6) with run/ls taken before
        the ':' — exactly the reference's loadtxt recipe
        (lumi_tools.py:83-100). Duplicate (run, ls) keys keep the LAST
        row, matching the reference's index build (dict assignment).
        With ``is_inst_lumi`` the value column holds average
        instantaneous luminosity and is scaled by the LHC
        seconds-per-lumisection constant (reference get_lumi:151)."""
        import numpy as np

        vals = np.loadtxt(
            path,
            delimiter=",",
            usecols=(0, 1, 6),
            converters={
                0: lambda s: s.split(":")[0],
                1: lambda s: s.split(":")[0],
            },
            encoding="utf-8",
            ndmin=2,
        )
        scale = cls.SECONDS_PER_LUMI_LHC if is_inst_lumi else 1.0
        seen: dict[tuple[int, int], float] = {}
        for r in vals:
            seen[(int(r[0]), int(r[1]))] = float(r[2]) * scale
        rows = [(run, ls, v) for (run, ls), v in seen.items()]
        return cls.from_rows(spark, rows)

    def get_lumi_df(self, events: DataFrame, run: str = "run", lumi: str = "luminosityBlock") -> DataFrame:
        """Lazy form of get_lumi: one row (n_pairs, total_lumi). The
        distinct is the only shuffle (small key space); the lumi table is
        broadcast (golden tables are ~1e5 rows at most)."""
        pairs = events.select(
            F.col(run).alias("run"), F.col(lumi).alias("lumi")
        ).distinct()
        joined = pairs.join(F.broadcast(self.table), ["run", "lumi"])
        return joined.agg(
            F.count(F.lit(1)).alias("n_pairs"), F.sum("intlumi").alias("total_lumi")
        )

    def get_lumi(self, events: DataFrame, run: str = "run", lumi: str = "luminosityBlock") -> float:
        row = self.get_lumi_df(events, run, lumi).collect()[0]
        return row["total_lumi"] or 0.0


class LumiList:
    """Accumulates distinct (run, lumi) pairs; ``+`` unions (reference
    LumiList, lumi_tools.py:341-404)."""

    def __init__(self, df: DataFrame):
        self.df = df.select("run", "lumi").distinct()

    @classmethod
    def from_events(cls, events: DataFrame, run: str = "run", lumi: str = "luminosityBlock"):
        return cls(events.select(F.col(run).alias("run"), F.col(lumi).alias("lumi")))

    def __add__(self, other: "LumiList") -> "LumiList":
        return LumiList(self.df.union(other.df))

    def count(self) -> int:
        return self.df.count()

    def collect(self) -> list[tuple[int, int]]:
        return sorted((r.run, r.lumi) for r in self.df.collect())
