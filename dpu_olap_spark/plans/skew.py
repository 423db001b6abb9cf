"""Skew mitigation: salted join.

AQE's skew-join splitting (on by default, session.py) handles most
skew at runtime by splitting oversized partitions. Salting is the
explicit fallback for pathological single-key skew (one key >> one
partition's memory) — the declarative analog of the reference's
random output shifts (GenerateRandomShifts,
/root/reference/host/partition/partitioner.cc:47-54, which exist for
the same reason: stop every device hammering the same partition).

Mechanics: the probe side scatters each row to one of S sub-keys; the
build side replicates each row to all S sub-keys; joining on
(key, salt) splits a hot key's work across S tasks. Correctness is
independent of the salt assignment; S multiplies the build side, so
salt only the keys that need it (or keep S small)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to probe-side key skew. The probe side gets a
    uniform pseudo-random salt (seeded — deterministic per partition
    layout, and correctness never depends on the assignment); the build
    side is replicated across all salts."""
    supported = {
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti",
    }
    if how not in supported:
        # right/full-outer would emit each unmatched build row once PER
        # SALT COPY (the build side is replicated n_salts times)
        raise ValueError(
            f"salted_join supports probe-preserving joins {sorted(supported)}; "
            f"got {how!r} — unmatched build rows would be duplicated"
        )
    p = probe.withColumn("_salt_p", (F.rand(42) * n_salts).cast("int"))
    b = build.withColumn(
        "_salt_b", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = p.join(
        b,
        (F.col(probe_key) == F.col(build_key)) & (F.col("_salt_p") == F.col("_salt_b")),
        how,
    )
    return joined.drop("_salt_p", "_salt_b")
