"""Sequence packing: greedy token-budget bin packing of documents —
the step between a curated corpus and fixed-length training batches.

Packing is inherently sequential, so the scalable unit is the GROUP: rows
are ordered within each pack group and packed greedily there, one
Arrow-batched ``applyInPandas`` per group, groups processed in parallel.
At 100 TB you pack within natural shards (e.g. one group per input file
or per ``spark_partition_id``) — cross-shard packing would impose a
global order, which is a sequential bottleneck by definition, and batch
composition does not require it.

The greedy rule (stable, replayable): walk rows by ``order_col``
ascending; keep a running token total; a row that would push the total
past ``budget`` starts the next pack. Oversized single rows get their
own pack (they need truncation downstream, not a packing failure).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    order_col: Optional[str] = None,
    group_col: Optional[str] = None,
) -> DataFrame:
    """(id, n_tokens, pack_id): pack_id numbers packs from 0 within each
    group in order. ``order_col`` defaults to ``id_col``; ``group_col``
    None packs everything as ONE group (deterministic global packing —
    fine for bounded corpora and the verification oracle; pass a shard
    key for 100 TB runs)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    order = order_col or id_col
    gcol = group_col
    src = df.select(
        *([F.col(gcol)] if gcol else [F.lit(0).alias("_g")]),
        F.col(id_col),
        F.col(order).alias("_ord"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    gkey = gcol if gcol else "_g"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord", kind="mergesort").reset_index(drop=True)
        pack_ids = []
        acc = 0
        pid = -1
        for rid, n in zip(pdf[id_col], pdf["n_tokens"]):
            # NULL token counts arrive as NaN after Arrow conversion;
            # int(NaN) would raise an opaque worker ValueError — name
            # the offending row instead
            if pd.isna(n):
                raise ValueError(
                    f"pack_greedy: NULL {tokens_col} for {id_col}={rid}"
                )
            n = int(n)
            if pid < 0 or acc + n > budget:
                pid += 1
                acc = n
            else:
                acc += n
            pack_ids.append(pid)
        out = pdf[[gkey, id_col, "n_tokens"]].copy()
        out["pack_id"] = pack_ids
        return out

    schema = f"{gkey} {dict(src.dtypes)[gkey]}, {id_col} {dict(src.dtypes)[id_col]}, n_tokens long, pack_id long"
    packed = src.groupBy(gkey).applyInPandas(pack, schema=schema)
    cols = [id_col, "n_tokens", "pack_id"]
    if gcol:
        cols.insert(0, gcol)
    return packed.select(*cols)
