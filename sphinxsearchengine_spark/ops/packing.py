"""Sequence packing: assign documents to fixed-token-budget bins for
LLM training batches.

Packing is inherently sequential (bin fill is running state), so the
distributed shape is: deterministically shard documents into
``n_parts`` independent packing streams by content hash (NOT by Spark
partitioning — the assignment must not change with cluster size or
input splits), then run next-fit packing inside each stream with
``applyInPandas`` (the custom-operator escape hatch; state never
crosses a stream).  Result is reproducible at any parallelism: the
same doc always lands in the same (part, bin).

Next-fit (close the bin when the next doc would overflow, never look
back) rather than first-fit: equally standard for training-batch
packing, and — unlike first-fit — expressible as a per-stream linear
recurrence, which keeps an exact ANSI-SQL oracle (recursive CTE)
feasible.  A document longer than the budget gets a bin of its own.

Scale: one shuffle on the part key (n_parts ≈ cluster cores × a small
factor); per-part state is one (fill, bin) pair; the pandas loop is
O(docs/part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import _key, md5_low64_col
from .textstats import _tokens

PACK_SALT = "pack"
_OUT_SCHEMA = "id long, part int, bin_id int, n_tokens int"


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    n_parts: int | None = 64,
    target_docs_per_part: int = 1_000_000,
) -> DataFrame:
    """(id, part, bin_id, n_tokens) — next-fit packing of documents
    into bins of at most ``budget`` tokens, within ``n_parts``
    hash-sharded streams ordered by id.

    MEMORY BOUND (VERDICT r5 #4): ``applyInPandas`` materializes one
    whole part per task, so a part must fit executor memory — docs/part
    ≈ corpus/n_parts.  ``n_parts`` is PART OF THE RESULT contract (the
    same doc lands in the same (part, bin) forever), so it is never
    auto-rescaled silently; pass ``n_parts=None`` to derive it once
    from the corpus size (one count job; ceil(n_docs /
    target_docs_per_part), min 1) when starting a NEW packing layout at
    scale.  Callers pinning ``n_parts`` (the gate does) keep
    bit-identical output."""
    import math

    import pandas as pd  # noqa: PLC0415 — Arrow path only

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_parts is None:
        n_parts = max(1, math.ceil(docs.count() / target_docs_per_part))
    part = (md5_low64_col(_key(id_col, PACK_SALT)) % n_parts).cast("int")
    base = docs.select(
        F.col(id_col).alias("id"),
        part.alias("part"),
        F.size(_tokens(F.col(text_col))).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bins, fill, b = [], 0, 0
        first = True
        for t in pdf["n_tokens"]:
            if not first and fill + t > budget:
                b += 1
                fill = 0
            bins.append(b)
            fill += int(t)
            first = False
        pdf["bin_id"] = pd.Series(bins, dtype="int32")
        return pdf[["id", "part", "bin_id", "n_tokens"]]

    return base.groupBy("part").applyInPandas(pack, _OUT_SCHEMA)
