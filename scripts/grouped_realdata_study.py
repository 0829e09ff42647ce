"""On-chip measurement: the two real-data statistical harnesses through
the NEW grouped paths — same canonical grids, data caches and epoch
counts as the round-3 sequential runs (which measured 21 min for the
PhysioNet comparison and 17 min for the climate CV), so the wall-clock
ratio is the result.

  python /tmp/grouped_realdata_study.py physionet   # grid: 2 sizes x 3 repeats
  python /tmp/grouped_realdata_study.py climate     # grid: 2 sizes x 5 folds + GOB single
"""
import os
import shutil
import sys
import time

WHICH = sys.argv[1] if len(sys.argv) > 1 else "both"


def run_physionet():
    DATA = "/tmp/phys_study_data"          # round-3 study cache (reused)
    os.environ["NJODE_DATA_PATH"] = DATA
    from njode_tpu.data import physionet as pdu
    from njode_tpu.utils import paths as path_cfg
    Q = 0.016
    root = os.path.join(path_cfg.training_data_path, "physionet")
    proc = os.path.join(root, "PhysioNet", "processed")
    os.makedirs(proc, exist_ok=True)
    for split, seed in (("set-a", 11), ("set-b", 12)):
        cache = os.path.join(proc, f"{split}_{Q}.npz")
        if not os.path.exists(cache):
            recs = pdu.make_synthetic_records(4000, quantization=Q,
                                              seed=seed)
            pdu.PhysioNetData._save_cache(cache, recs)
            print(f"wrote {cache}", flush=True)

    from njode_tpu.experiments import configs
    smp = "/tmp/phys_study_data/saved_models_physionet_grouped/"
    t0 = time.time()
    ret = configs.run_experiment("physionet_comparison", epochs=8,
                                 repeats=3, vmap_groups=True,
                                 saved_models_path=smp)
    wall = time.time() - t0
    print(f"physionet comparison GROUPED: return={ret} wall={wall:.1f}s "
          f"(round-3 sequential: ~1260 s / 21 min) -> {1260 / wall:.2f}x", flush=True)

    report_physionet(smp)


def report_physionet(smp="/tmp/phys_study_data/saved_models_physionet_grouped/"):
    from njode_tpu.analysis import extras
    df = extras.get_training_overview(
        path=smp,
        params_extract_desc=("network_size", "dataset", "hidden_size"),
        val_test_params_extract=(("max", "epoch", "epoch", "epochs_trained"),
                                 ("min", "eval_metric", "eval_metric",
                                  "min_eval_metric")))
    print(df.groupby("network_size")["min_eval_metric"].agg(
        ["mean", "std"]), flush=True)


def run_climate():
    DATA = "/tmp/cv_study_data"            # round-3 study data (reused)
    os.environ["NJODE_DATA_PATH"] = DATA
    from njode_tpu.data import climate as cdu
    from njode_tpu.utils import paths as path_cfg
    clim_dir = os.path.join(path_cfg.training_data_path, "climate")
    os.makedirs(clim_dir, exist_ok=True)
    csv = os.path.join(clim_dir, "small_chunked_sporadic.csv")
    if not os.path.exists(csv):
        cdu.make_synthetic_climate_csv(csv)
    for i in range(5):
        src = ("/root/reference/data/training_data/climate/"
               f"small_chunk_fold_idx_{i}")
        dst = os.path.join(clim_dir, f"small_chunk_fold_idx_{i}")
        if not os.path.exists(dst):
            shutil.copytree(src, dst)

    from njode_tpu.experiments import configs
    smp = os.path.join(DATA, "saved_models_climate_grouped")
    # run_experiment's climate grid writes to the default climate dir —
    # give the grouped run its own saved_models_path via the grid params
    params, first_id = configs.EXPERIMENTS["climate_cross_validation"](
        epochs=20)
    for p in params:
        p["saved_models_path"] = smp
    from njode_tpu.training import sweeps
    t0 = time.time()
    ret = sweeps.parallel_training(params=params, first_id=1,
                                   vmap_groups=True)
    wall = time.time() - t0
    print(f"climate CV GROUPED: return={ret} wall={wall:.1f}s "
          f"(round-3 sequential: 1009 s / 17 min) -> {1009 / wall:.2f}x", flush=True)

    from njode_tpu.analysis import extras
    out = extras.get_cross_validation(
        path=smp,
        param_combinations=({"network_size": 50}, {"network_size": 400},
                            {"dropout_rate": 0.2}),
        save_path=os.path.join(smp, "cross_val.csv"))
    with open(os.path.join(smp, "cross_val.csv")) as f:
        print(f.read(), flush=True)


if WHICH in ("physionet", "both"):
    run_physionet()
if WHICH == "physionet-report":
    report_physionet()
if WHICH in ("climate", "both"):
    run_climate()
