"""Round-4 flagship: the reference's convergence study at FULL published
scale, in one command on one chip (VERDICT r3 item 2).

The reference's headline statistical harness is the Heston convergence
analysis (``/root/reference/NJODE/parallel_train.py:292-351``):
training_size {200..12800} (7) x network_size {10..320} (6) x 5 repeats,
100 epochs each with per-epoch oracle evaluation — 210 models / 21,000
model-epochs, a multi-day joblib run on the reference's hardware. Here it
runs through ``parallel_training(vmap_groups=True)``: same-architecture
entries (7 training sizes x 5 repeats = 35 members per width) train as
vmapped ensembles sharing one compile, with full trainer artifacts.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/full_conv_study.py

Outputs under NJODE_DATA_PATH (default /tmp/conv_study_r4):
  saved_models_conv_full/      per-model artifacts + registry
  overview CSV + errorbar plots (plot_convergence_study, both axes)
and prints the wall time + the min-eval-metric table.
"""
import os
import sys
import time

DATA = os.environ.setdefault("NJODE_DATA_PATH", "/tmp/conv_study_r4")
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

from njode_tpu.experiments import configs                    # noqa: E402
from njode_tpu.utils import paths as path_cfg                # noqa: E402

smp = os.path.join(DATA, "saved_models_conv_full/")
print(f"data path {path_cfg.data_path}; saved models {smp}", flush=True)

t0 = time.time()
configs.ensure_base_datasets(nb_paths=20_000)
print(f"datasets ready in {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
ret = configs.run_experiment("convergence_study", dataset="Heston",
                             epochs=EPOCHS, repeats=REPEATS,
                             vmap_groups=True, saved_models_path=smp)
wall = time.time() - t0
n_models = 7 * 6 * REPEATS
print(f"convergence study: return={ret} wall={wall / 60:.1f} min "
      f"({n_models} models, {n_models * EPOCHS} model-epochs, "
      f"{wall / (n_models * EPOCHS):.3f} s/model-epoch all-in)", flush=True)

from njode_tpu.analysis import extras                        # noqa: E402

df = extras.get_training_overview(
    path=smp,
    params_extract_desc=("dataset", "network_size", "training_size",
                         "hidden_size"),
    val_test_params_extract=(
        ("max", "epoch", "epoch", "epochs_trained"),
        ("min", "evaluation_mean_diff", "evaluation_mean_diff",
         "min_eval_metric"),
        ("min", "eval_loss", "eval_loss", "min_eval_loss")),
    save_file=os.path.join(smp, "conv_overview.csv"))
print(df.groupby(["network_size", "training_size"])["min_eval_metric"]
      .agg(["mean", "std", "count"]).to_string(), flush=True)

for axis in ("training_size", "network_size"):
    extras.plot_convergence_study(path=smp, x_axis=axis, x_log=True,
                                  y_log=True)
print("plots + overview written under", smp, flush=True)
