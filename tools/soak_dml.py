"""Randomized DML/serving/ANN soak (deeper than the CI-budgeted
hypothesis state machines in tests/ — same invariants, arbitrary op
count, any seed).

Each step applies a random collection op, then checks the full
invariant set:

  - count() == model size
  - pack_serving() (incremental when possible) equals the model's rows
  - a fresh-handle FULL pack rebuild equals the incremental one
    (checked every ~5 steps — it pays a Spark job)
  - exhaustive-probe search_ann returns the exact top-k of the model
  - optimize(ann_cluster=True) never changes any of the above

Usage: python tools/soak_dml.py [steps] [seed]
Prints one JSON line with op counts; exits non-zero on the first
invariant violation.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = random.Random(seed)

    import numpy as np

    from fastpyvectordb_spark.catalog import VectorDB
    from fastpyvectordb_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    db = VectorDB(spark, tempfile.mkdtemp() + "/soakdb")
    c = db.create_collection("soak", dimensions=8)

    def vec():
        return [rng.uniform(-1, 1) for _ in range(8)]

    def batch(rows):
        return spark.createDataFrame(
            rows, "id string, embedding array<float>"
        )

    model: dict[str, list[float]] = {
        f"s{i}": vec() for i in range(80)
    }
    c.insert_batch(batch(sorted(model.items())))
    c.build_ann_index(n_lists=8, max_iter=5)
    counts: dict[str, int] = {}
    fresh_n = 0

    def check(step: int, op: str) -> None:
        assert c.count() == len(model), f"count after {op} @ {step}"
        pack = c.pack_serving()
        assert pack is not None
        got = {
            rid: [round(float(x), 5) for x in pack["vmat"][i]]
            for i, rid in enumerate(pack["ids"])
        }
        want = {
            rid: [round(float(np.float32(x)), 5) for x in v]
            for rid, v in model.items()
        }
        assert got == want, f"pack rows diverged after {op} @ {step}"
        if step % 5 == 4:
            full = db.get_collection("soak").pack_serving()
            assert list(full["ids"]) == list(pack["ids"])
            assert np.array_equal(full["vmat"], pack["vmat"])
        if model:
            qid = rng.choice(sorted(model))
            st = c._ann()
            nl = int(st.centroids.shape[0]) if st.centroids is not None else 64
            exact = [i for i, _ in c.search_local(model[qid], k=5)]
            ann = [i for i, _ in c.search_ann(model[qid], k=5, nprobe=nl)]
            assert ann == exact, f"exhaustive ann != exact after {op} @ {step}"

    OPS = ["insert", "upsert", "delete", "delete_fast", "optimize",
           "optimize_ann", "restore_noop", "vacuum"]
    for step in range(steps):
        op = rng.choice(OPS)
        counts[op] = counts.get(op, 0) + 1
        if op == "insert":
            rows = [(f"n{fresh_n + j}", vec()) for j in range(rng.randint(1, 4))]
            fresh_n += len(rows)
            c.insert_batch(batch(rows))
            model.update(rows)
        elif op == "upsert":
            ids = rng.sample(sorted(model), min(3, len(model)))
            rows = [(i, vec()) for i in ids]
            c.upsert(batch(rows))
            model.update(rows)
        elif op in ("delete", "delete_fast"):
            if len(model) <= 10:
                continue
            ids = rng.sample(sorted(model), rng.randint(1, 3))
            c.delete(ids=ids, verify_existing=(op == "delete"))
            for i in ids:
                model.pop(i)
        elif op == "optimize":
            c.optimize()
        elif op == "optimize_ann":
            if not model:
                continue
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # break-even sizing note
                c.optimize(ann_cluster=True, target_partitions=8)
        elif op == "restore_noop":
            # restore to the CURRENT version: must be a no-op for data
            c.restore(c._current_version())
        elif op == "vacuum":
            c.vacuum(keep_last=2)
        check(step, op)

    print(json.dumps({"steps": steps, "seed": seed, "ops": counts,
                      "final_rows": len(model)}))


if __name__ == "__main__":
    main()
