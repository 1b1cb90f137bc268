"""Train the frozen deep BPE vocabulary artifacts (functions/bpe.py).

One-time (re-)generation of the committed tokenizer artifacts — the
vocab.bpe analogue. Two artifacts:

  * assets/vocab_deep.json      — sf0.1 corpus, >=256 merges (the
    production-depth vocabulary every deep encode/pack lane freezes on);
  * assets/vocab_deep_sf0001.json — sf0.001 twin, small enough that the
    test suite can RETRAIN it in-session and assert byte equality
    (training determinism contract: greedy selection is a pure function
    of exact integer pair counts with a total tie order).

Usage: python tools/train_vocab.py [sf01_dir] [sf0001_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_MERGES = 320
BATCH_CAP = 64
SWEEPS = 40


def train(spark, sf_dir: str, *, max_merges: int = MAX_MERGES) -> list:
    from mcp_local_rag_spark.functions.bpe import sp_units
    from mcp_local_rag_spark.queries.curation import _bpe_train_batched
    from mcp_local_rag_spark.session import load

    units = sp_units(load(spark, sf_dir, "documents"))
    rows, _state, base = _bpe_train_batched(
        spark,
        None,
        sweeps=SWEEPS,
        batch_cap=BATCH_CAP,
        max_merges=max_merges,
        words=units,
        select="greedy",
    )
    base.unpersist()
    return [(l, r) for _sweep, l, r, _merged, _cnt in rows]


def main() -> None:
    from mcp_local_rag_spark.functions.bpe import (
        DEEP_VOCAB_PATH,
        _ASSET_DIR,
        save_vocab,
    )
    from mcp_local_rag_spark.session import get_spark

    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf0001 = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark("train-vocab")
    params = {
        "select": "greedy",
        "batch_cap": BATCH_CAP,
        "sweeps": SWEEPS,
        "max_merges": MAX_MERGES,
    }

    for sf_dir, path in (
        (sf01, DEEP_VOCAB_PATH),
        (sf0001, os.path.join(_ASSET_DIR, "vocab_deep_sf0001.json")),
    ):
        t0 = time.time()
        merges = train(spark, sf_dir)
        art = save_vocab(
            path,
            [(l, r, None) for l, r in merges],
            trained_on=os.path.basename(sf_dir.rstrip("/")) + "/documents",
            params=params,
        )
        print(
            f"# {path}: {art['n_merges']} merges from {sf_dir}"
            f" in {time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main()
