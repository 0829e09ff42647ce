"""Model registry: ``model_overview.csv`` mapping id -> JSON param description.

Parity with the reference's registry (``train.py:302-334``,
``parallel_train.py:139-202``): the JSON description doubles as the config
store; an existing id means resume-with-saved-params."""

from __future__ import annotations

import json
import os

import numpy as np

from njode_tpu.utils.paths import makedirs


def overview_file(saved_models_path: str) -> str:
    return os.path.join(saved_models_path, "model_overview.csv")


def load_overview(saved_models_path: str):
    import pandas as pd
    makedirs(saved_models_path)
    f = overview_file(saved_models_path)
    if not os.path.exists(f):
        return pd.DataFrame(data=None, columns=["id", "description"])
    return pd.read_csv(f, index_col=0)


def register_model(saved_models_path: str, model_id, desc: str):
    import pandas as pd
    df = load_overview(saved_models_path)
    app = pd.DataFrame([[model_id, desc]], columns=["id", "description"])
    df = pd.concat([df, app], ignore_index=True)
    df.to_csv(overview_file(saved_models_path))


def resolve_model_id(saved_models_path: str, model_id, desc: str):
    """Reference semantics (``train.py:317-331``): None -> next free id and
    register; existing id -> resume with the *saved* description.

    :return: (model_id, desc, params_dict_from_desc_or_None, resume: bool)
    """
    df = load_overview(saved_models_path)
    max_id = int(np.max(df["id"].values)) if len(df) else 0
    if model_id is None:
        model_id = max_id + 1
    if model_id not in df["id"].values:
        register_model(saved_models_path, model_id, desc)
        return model_id, desc, None, False
    saved_desc = (df["description"].loc[df["id"] == model_id]).values[0]
    return model_id, saved_desc, json.loads(saved_desc), True
