#!/usr/bin/env python
"""Second-operator scaling evidence: MinHash-LSH dedup at N vs 4N cores.

Same protocol as run_scaling.py (taskset-pinned spark-submit, tmpfs
shuffle dirs, input-warm pre-read, best-of-K per level, efficiency =
T(N) / (4 * T(4N)) with gate >= 0.8) on a different workload class: the
near-dup pipeline (Arrow-batched shingling -> band explode -> bucket
groupBy -> exact-verify join) instead of the CRF KG pipeline — so the
scaling record rests on two independent job shapes.

Input staging: the sf0.1 documents table replicated ``--repl`` times with
offset doc_ids and EVERY WORD suffixed per replica — replicas share no
shingles, so cross-replica Jaccard is 0 and the candidate-pair workload
scales linearly with the corpus (a naive text replication would make all
K copies mutual near-dups and blow the pair count up quadratically,
changing the workload class instead of its size).

Run:  python scripts/run_dedup_scaling.py [--repl 8] [--n-cores 2]
      [--trials 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_scaling import make_zip, run_job  # noqa: E402

SF_DOCS = "/root/testdata/sf0.1/documents.parquet"


def stage_docs(repl: int) -> str:
    out = f"/tmp/rbs_scaling_docs_x{repl}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(SF_DOCS, columns=["doc_id", "text"]).to_pandas()
    os.makedirs(out, exist_ok=True)
    n = len(base)
    for k in range(repl):
        part = base.copy()
        part["doc_id"] = part["doc_id"] + k * 10_000_000
        if k > 0:
            sfx = f"r{k}"
            part["text"] = [
                " ".join(w + sfx for w in t.split()) for t in part["text"]
            ]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            os.path.join(out, "documents.parquet")
            if repl == 1
            else os.path.join(out, f"part-{k:03d}.parquet"),
        )
    # dedup_minhash_lsh reads {dir}/documents.parquet — make the staged
    # parts a directory of that name
    if repl > 1:
        doc_dir = os.path.join(out, "documents.parquet")
        os.makedirs(doc_dir, exist_ok=True)
        for k in range(repl):
            os.replace(
                os.path.join(out, f"part-{k:03d}.parquet"),
                os.path.join(doc_dir, f"part-{k:03d}.parquet"),
            )
    open(done, "w").write(f"docs={n * repl}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=8)
    ap.add_argument("--n-cores", type=int, default=2)
    ap.add_argument("--trials", type=int, default=3)
    a = ap.parse_args()

    inp = stage_docs(a.repl)
    zpath = make_zip()
    rec: dict = {
        "kind": f"dedup_scaling_x{a.repl}",
        "protocol": (
            "run_scaling.py protocol (taskset pin, tmpfs shuffle, "
            "input-warm), job=dedup_job.py, min-over-trials per level"
        ),
        "trials": {},
    }
    out_path = os.path.join(REPO, "BENCH", f"scaling_dedup_x{a.repl}.json")

    def save() -> None:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)

    for par in (4 * a.n_cores, a.n_cores, 4 * a.n_cores):
        # interleave 4N / N / 4N so a drifting epoch shows up as
        # level-internal spread rather than silently biasing one level
        key = f"p{par}"
        rec["trials"].setdefault(key, [])
        for _ in range(a.trials if par == a.n_cores else max(1, a.trials // 2 + 1)):
            r = run_job(par, inp, zpath, job="dedup_job.py")
            r["t"] = time.strftime("%H:%M:%S")
            rec["trials"][key].append(r)
            print(json.dumps(r), flush=True)
            save()
    t_n = min(x["wall_sec"] for x in rec["trials"][f"p{a.n_cores}"])
    t_4n = min(x["wall_sec"] for x in rec["trials"][f"p{4 * a.n_cores}"])
    rec["t_n_min"] = t_n
    rec["t_4n_min"] = t_4n
    rec["efficiency"] = round(t_n / (4 * t_4n), 3)
    rec["gate"] = ">= 0.8 " + ("PASS" if rec["efficiency"] >= 0.8 else "FAIL")
    save()
    print(json.dumps({k: rec[k] for k in ("t_n_min", "t_4n_min", "efficiency", "gate")}))


if __name__ == "__main__":
    main()
