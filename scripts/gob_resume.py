"""Round-5: finish the published GOB comparison block (ids 29-51).

The first 28 of the 51 runs (reference ``parallel_train.py:354-424``)
completed at the published 100 epochs in the earlier round-5 chip slices
and their overview rows are committed
(``results/published_gob_overview.csv``). /tmp was wiped between
sessions, so the id-keyed checkpoints for 1-28 are gone — instead of
retraining them, this driver runs ONLY the never-started tail
(params[28:], first_id=29) into a fresh saved-models dir, harvests the
new rows with a manual per-id loop (``get_training_overview`` raises on
ids without metric CSVs — CLAUDE.md round-5 note), and merges them with
the committed 1-28 rows into the full 51-row overview.

  PYTHONUNBUFFERED=1 python scripts/gob_resume.py [start_idx]
"""
import os
import sys
import time

START = int(sys.argv[1]) if len(sys.argv) > 1 else 29  # 1-based run id
DATA = os.environ.setdefault("NJODE_DATA_PATH", "/tmp/published_blocks")

from njode_tpu.experiments import configs                    # noqa: E402
from njode_tpu.training import sweeps, registry              # noqa: E402


def harvest(smp, out_csv):
    """Per-id manual harvest (registry rows whose metric CSV exists),
    emitting the SAME columns as results/published_gob_overview.csv so
    the 1-28 and 29-51 slices concatenate into one 51-row artifact."""
    import json
    import pandas as pd
    rows = []
    df = registry.load_overview(smp)
    for _, rec in df.iterrows():
        mid = int(rec["id"])
        mfile = os.path.join(smp, f"id-{mid}", f"metric_id-{mid}.csv")
        if not os.path.exists(mfile):
            continue
        desc = json.loads(rec["description"])
        m = pd.read_csv(mfile)
        if not len(m):
            continue
        rows.append({
            "id": mid,
            "dataset": desc.get("dataset"),
            "model": desc.get("other_model") or "NJODE",
            "hidden_size": desc.get("hidden_size"),
            "impute": desc.get("GRU_ODE_Bayes-impute"),
            "logvar": desc.get("GRU_ODE_Bayes-logvar"),
            "mixing": desc.get("GRU_ODE_Bayes-mixing"),
            "epochs_trained": int(m["epoch"].max()),
            "min_evaluation_mean_diff":
                float(m["evaluation_mean_diff"].min()),
            "min_eval_loss": float(m["eval_loss"].min()),
            "train_s_per_epoch": float(m["train_time"].iloc[1:].mean())
                if len(m) > 1 else float(m["train_time"].iloc[-1]),
            "eval_s_per_epoch": float(m["eval_time"].iloc[1:].mean())
                if len(m) > 1 else float(m["eval_time"].iloc[-1]),
        })
    out = pd.DataFrame(rows).sort_values("id")
    out.to_csv(out_csv, index=False)
    print(f"harvested {len(out)} rows -> {out_csv}", flush=True)
    return out


def main():
    configs.ensure_base_datasets(nb_paths=20_000)
    smp = os.path.join(DATA, "saved_models_gob_comparison/")
    params, _ = configs.gru_ode_bayes_comparison(epochs=100)
    assert len(params) == 51, len(params)
    tail = params[START - 1:]
    for p in tail:
        p["saved_models_path"] = smp
    t0 = time.time()
    ret = sweeps.parallel_training(params=tail, first_id=START,
                                   vmap_groups=True)
    wall = time.time() - t0
    print(f"BLOCK gob tail (ids {START}-51): returns={ret} "
          f"wall={wall / 60:.1f} min ({len(tail)} runs)", flush=True)
    harvest(smp, os.path.join(smp, "overview_tail.csv"))


if __name__ == "__main__":
    main()
