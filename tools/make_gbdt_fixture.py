#!/usr/bin/env python
"""Generate coffea_spark/data/gbdt_demo.json — a small hand-built GBDT
ensemble in the official XGBoost save_model JSON layout (public schema,
xgboost doc/model.schema), so gbdt_load_json exercises the real field
names without needing the xgboost wheel to author the fixture.

Features (computed from the documents table in both engines):
  f0 = whitespace token count
  f1 = mean token length
  f2 = distinct-token ratio

Thresholds sit strictly inside the observed testdata ranges
(nw 10-100 median ~55; mean_len 3.5-5.7 median 4.5; dratio 0.27-1.0
median 0.46) so every split partitions real rows. Integer-feature
thresholds use .5 offsets so no value can land exactly on a boundary.
Deterministic: re-running reproduces the identical file.
"""

import json
import os


def tree(nodes):
    """nodes: list of (left, right, feat, cond, default_left)."""
    return {
        "base_weights": [0.0] * len(nodes),
        "categories": [],
        "categories_nodes": [],
        "categories_segments": [],
        "categories_sizes": [],
        "default_left": [int(n[4]) for n in nodes],
        "id": 0,
        "left_children": [n[0] for n in nodes],
        "loss_changes": [0.0] * len(nodes),
        "parents": [2147483647] * len(nodes),
        "right_children": [n[1] for n in nodes],
        "split_conditions": [n[3] for n in nodes],
        "split_indices": [n[2] for n in nodes],
        "split_type": [0] * len(nodes),
        "sum_hessian": [1.0] * len(nodes),
        "tree_param": {
            "num_deleted": "0",
            "num_feature": "3",
            "num_nodes": str(len(nodes)),
            "size_leaf_vector": "1",
        },
    }


LEAF = -1
TREES = [
    # (left, right, feat, cond-or-leaf-value, default_left)
    tree([
        (1, 2, 0, 40.5, 1),          # 0: nw < 40.5 ?
        (LEAF, LEAF, 0, -0.40, 0),   # 1: leaf
        (3, 4, 1, 4.2, 0),           # 2: mean_len < 4.2 ?
        (LEAF, LEAF, 0, 0.25, 0),    # 3: leaf
        (LEAF, LEAF, 0, 0.55, 0),    # 4: leaf
    ]),
    tree([
        (1, 2, 2, 0.45, 1),          # 0: dratio < 0.45 ?
        (3, 4, 0, 60.5, 0),          # 1: nw < 60.5 ?
        (LEAF, LEAF, 0, 0.30, 0),    # 2: leaf
        (LEAF, LEAF, 0, -0.15, 0),   # 3: leaf
        (LEAF, LEAF, 0, 0.05, 0),    # 4: leaf
    ]),
    tree([
        (1, 2, 1, 3.9, 0),           # 0: mean_len < 3.9 ?
        (LEAF, LEAF, 0, -0.20, 0),   # 1: leaf
        (3, 4, 2, 0.60, 1),          # 2: dratio < 0.60 ?
        (LEAF, LEAF, 0, 0.10, 0),    # 3: leaf
        (LEAF, LEAF, 0, 0.35, 0),    # 4: leaf
    ]),
    tree([
        (1, 2, 0, 52.5, 1),          # 0: nw < 52.5 ?
        (3, 4, 1, 4.05, 0),          # 1: mean_len < 4.05 ?
        (LEAF, LEAF, 0, 0.20, 0),    # 2: leaf
        (LEAF, LEAF, 0, -0.05, 0),   # 3: leaf
        (LEAF, LEAF, 0, 0.12, 0),    # 4: leaf
    ]),
]

MODEL = {
    "learner": {
        "attributes": {},
        "feature_names": [],
        "feature_types": [],
        "gradient_booster": {
            "model": {
                "gbtree_model_param": {
                    "num_parallel_tree": "1",
                    "num_trees": str(len(TREES)),
                },
                "iteration_indptr": list(range(len(TREES) + 1)),
                "tree_info": [0] * len(TREES),
                "trees": TREES,
            },
            "name": "gbtree",
        },
        "learner_model_param": {
            "base_score": "0.5",
            "boost_from_average": "1",
            "num_class": "0",
            "num_feature": "3",
            "num_target": "1",
        },
        "objective": {
            "name": "binary:logistic",
            "reg_loss_param": {"scale_pos_weight": "1"},
        },
    },
    "version": [2, 0, 0],
}

if __name__ == "__main__":
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "coffea_spark", "data", "gbdt_demo.json",
    )
    with open(out, "w") as fh:
        json.dump(MODEL, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", out)
