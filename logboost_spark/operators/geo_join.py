"""CIDR longest-prefix lookup as a prefix-bucketed broadcast range join.

The reference resolves IP → (ASN, org) / (country, city) with a per-row
mmdb trie lookup (helpers/helpers.go:369-391). The Spark-native shape is
a **broadcast range join**: the lookup table stores [net_start, net_end]
integer intervals; a naive `BETWEEN` join would be a nested-loop
(BroadcastNestedLoopJoin — O(rows × cidrs)), so we bucket both sides on
the top ``bucket_bits`` of the address. Each interval is exploded into
the buckets it spans, making the join an **equi hash join on the bucket**
with a residual BETWEEN — O(rows × avg-intervals-per-bucket), and still
broadcast (no fact-side shuffle).

At 100 TB this matters: the fact table never moves; the exploded lookup
side for a full GeoLite2-style table (~500k mostly-/16-or-longer CIDRs,
16 bucket bits) stays ≪ 10 MB per executor.

Intervals must be disjoint (MaxMind trees flatten to disjoint ranges);
:func:`flatten_intervals` enforces longest-prefix-wins for arbitrary
inputs, driver-side, since lookup tables are small by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_BITS = 16


def bucketize_intervals(lookup: DataFrame, bucket_bits: int = DEFAULT_BUCKET_BITS) -> DataFrame:
    """Explode [net_start, net_end] intervals into covering buckets."""
    shift = 32 - bucket_bits
    return lookup.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.shiftright(F.col("net_start"), shift),
                F.shiftright(F.col("net_end"), shift),
            )
        ),
    )


def flatten_intervals(rows: list[tuple], n_attrs: int) -> list[tuple]:
    """Longest-prefix-wins flattening of possibly-overlapping intervals.

    ``rows``: (net_start, net_end, *attrs). Narrower (more specific)
    intervals punch holes into wider ones, mirroring mmdb trie semantics.
    Driver-side only — lookup tables are dimension-sized.
    """
    # sort widest-first so narrower intervals overwrite later
    order = sorted(rows, key=lambda r: -(r[1] - r[0]))
    out: list[list] = []
    for start, end, *attrs in order:
        pieces = [(start, end)]
        kept: list[list] = []
        for o in out:
            new_pieces = []
            for s, e in pieces:
                if o[1] < s or o[0] > e:  # disjoint
                    new_pieces.append((s, e))
                    continue
                if s < o[0]:
                    new_pieces.append((s, o[0] - 1))
                if e > o[1]:
                    new_pieces.append((o[1] + 1, e))
            pieces = new_pieces
        # existing (narrower came later? no — narrower processed later) —
        # current interval is never wider than already-placed ones' holes
        for s, e in pieces:
            out.append([s, e, *attrs])
    out.sort(key=lambda r: r[0])
    return [tuple(r) for r in out]


def range_lookup_join(
    fact: DataFrame,
    ip_long: Column,
    lookup: DataFrame,
    attrs: list[str],
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    prefix: str = "",
) -> DataFrame:
    """Left-join interval attributes onto ``fact`` keyed by an int IP column.

    Produces columns ``{prefix}{attr}`` (null on miss). The physical plan
    is BroadcastHashJoin on the bucket with the BETWEEN as join residual —
    verify with ``.explain()``.
    """
    shift = 32 - bucket_bits
    b = bucketize_intervals(lookup, bucket_bits)
    sel = [F.col("_bucket"), F.col("net_start"), F.col("net_end")] + [
        F.col(a).alias(f"{prefix}{a}") for a in attrs
    ]
    b = b.select(*sel)
    fact = fact.withColumn("_ip_long_join", ip_long)
    cond = (
        (F.shiftright(F.col("_ip_long_join"), shift) == b["_bucket"])
        & (F.col("_ip_long_join") >= b["net_start"])
        & (F.col("_ip_long_join") <= b["net_end"])
    )
    out = fact.join(F.broadcast(b), cond, "left")
    return out.drop("_bucket", "net_start", "net_end", "_ip_long_join")
