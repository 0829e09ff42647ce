"""Filesystem layout for datasets, saved models, and registries.

Mirrors the reference's ``data/`` conventions (``data_utils.py:37-38``,
``train.py:66-67``) but rooted at the repo (or ``NJODE_DATA_PATH``)."""

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

data_path = os.environ.get("NJODE_DATA_PATH",
                           os.path.join(_REPO_ROOT, "data"))
training_data_path = os.path.join(data_path, "training_data")
saved_models_path = os.path.join(data_path, "saved_models")


def makedirs(dirname):
    os.makedirs(dirname, exist_ok=True)
