"""Demo CLI: train a new NJODE model or load a pretrained one and plot.

Capability parity with ``/root/reference/NJODE/demo.py``:

    python demo.py --dataset=BlackScholes            # train 200 epochs
    python demo.py --model_id=1                      # pretrained + plot-only

``--model_id`` in {1, 2, 3} selects the reference's pretrained
BlackScholes/Heston/OrnsteinUhlenbeck checkpoints (``demo.py:52-61``); they
are imported from the reference's torch ``checkpt.tar`` files on first use
(training/torch_compat.py) when the reference data directory is available.
Datasets are auto-generated if missing — 20,000 paths for training, 100 for
plot-only (``demo.py:64-74``; the reference README notes the resulting
plot-dataset shadowing caveat, ``README.md:54-57``).
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SAVED = "/root/reference/data/saved_models"
PRETRAINED_DATASETS = {1: "BlackScholes", 2: "Heston", 3: "OrnsteinUhlenbeck"}


def ensure_pretrained(model_id, saved_models_path):
    """Import the reference's pretrained checkpoint + registry row for
    ``model_id`` into our saved-models dir (idempotent)."""
    import pandas as pd

    from njode_tpu.training import registry, torch_compat
    from njode_tpu.training.steps import make_optimizer
    from njode_tpu.utils.paths import makedirs

    out_dir = os.path.join(saved_models_path, f"id-{model_id}")
    if os.path.exists(os.path.join(out_dir, "last_checkpoint",
                                   "checkpt.msgpack")):
        return
    ref_overview = os.path.join(REFERENCE_SAVED, "model_overview.csv")
    ref_ckpt = os.path.join(REFERENCE_SAVED, f"id-{model_id}",
                            "last_checkpoint")
    if not os.path.exists(ref_ckpt):
        raise FileNotFoundError(
            f"pretrained checkpoint {ref_ckpt} not available; train a new "
            "model instead (omit --model_id)")
    df = pd.read_csv(ref_overview, index_col=0)
    desc = df["description"].loc[df["id"] == model_id].values[0]
    params_dict = json.loads(desc)

    if model_id not in registry.load_overview(saved_models_path)["id"].values:
        registry.register_model(saved_models_path, model_id, desc)
    optimizer = make_optimizer(params_dict["learning_rate"])
    makedirs(out_dir)
    params, epoch, weight = torch_compat.import_torch_checkpoint(
        ref_ckpt, os.path.join(out_dir, "last_checkpoint"), optimizer,
        use_rnn=params_dict["use_rnn"])
    from njode_tpu.training import checkpoints
    checkpoints.save_checkpoint(os.path.join(out_dir, "best_checkpoint"),
                                params, optimizer.init(params), epoch,
                                weight)
    ref_metric = os.path.join(REFERENCE_SAVED, f"id-{model_id}",
                              f"metric_id-{model_id}.csv")
    if os.path.exists(ref_metric):
        shutil.copy(ref_metric,
                    os.path.join(out_dir, f"metric_id-{model_id}.csv"))
    print(f"imported pretrained reference model id={model_id}")


def main():
    parser = argparse.ArgumentParser(description="Running NJODE (TPU-native)")
    parser.add_argument(
        "--dataset", type=str, default="BlackScholes",
        help="one of: 'BlackScholes', 'Heston', 'OrnsteinUhlenbeck'")
    parser.add_argument("--model_id", type=str, default="None",
                        help="None or int of a pretrained model")
    parser.add_argument("--epochs", type=int, default=200,
                        help="int, number of epochs")
    args = parser.parse_args()
    try:
        model_id = int(args.model_id)
    except (TypeError, ValueError):
        model_id = None
    dataset = args.dataset
    save_every = 5
    plot_only = False
    if model_id in (1, 2, 3):
        print("use pretrained model ...")
        save_every = 1
        dataset = PRETRAINED_DATASETS[model_id]
        plot_only = True

    from njode_tpu.data import datasets as data_utils
    from njode_tpu.training import trainer
    from njode_tpu.utils.paths import saved_models_path, training_data_path

    if plot_only:
        ensure_pretrained(model_id, saved_models_path)

    # exact-name check (the reference's substring test, demo.py:64-66,
    # mistakes HestonWOFeller datasets for Heston ones — conscious fix)
    if data_utils._get_time_id(dataset, None) is None:
        print(f"no dataset exists for: {dataset} -> generate dataset...")
        dataset_dict = dict(data_utils.hyperparam_default)
        dataset_dict["nb_paths"] = 100 if plot_only else 20_000
        path, _ = data_utils.create_dataset(stock_model_name=dataset,
                                            hyperparam_dict=dataset_dict)
        print(f"dataset stored as: {path}")

    nn = ((50, "tanh"), (50, "tanh"))
    trainer.train(
        model_id=model_id, epochs=args.epochs, batch_size=100, save_every=save_every,
        learning_rate=0.001, test_size=0.2, seed=398,
        hidden_size=10, bias=True, dropout_rate=0.1,
        ode_nn=nn, enc_nn=nn, readout_nn=nn, use_rnn=False,
        which_loss="standard", residual_enc_dec=True,
        solver="euler", weight=0.5, weight_decay=1.0,
        dataset=dataset, dataset_id=None, paths_to_plot=(1, 2, 3, 4),
        plot_only=plot_only)


if __name__ == "__main__":
    main()
