"""Migrate trained reference (Tw6249/dgppo_fov) checkpoints into this framework.

The reference pickles per-network flax param dicts into `models/<step>/
{actor,Vl,Vh}.pkl` (reference informarl_lagr.py:311-327). This framework uses
the same architecture with two fused layouts (see nn/gnn.py, algo/modules.py):

 - Each GraphTransformer layer's four Dense projections (query Dense_0,
   key Dense_1, value Dense_2, node-update Dense_4; reference nn/gnn.py:85-113)
   are one fused `qkvu` Dense whose kernel is their column concatenation;
   the edge projection (Dense_3, no bias) is the `edge` Dense.
 - The policy's OutputDenseMean / OutputDenseStdTrans heads
   (reference policy.py:69-70) are one fused `OutputDenseMeanStd` Dense
   with columns [mean | std_trans].
 - RNN cells are numbered from 0 (reference flax numbering starts at 1).

`remap_policy_params` / `remap_value_params` convert a reference param tree
into ours exactly (same floats, new layout), so a policy trained with the
reference produces identical actions here (tests/test_reference_parity_policy.py).
"""
from typing import Dict

import jax.numpy as jnp


def _remap_gnn(ref_gnn: Dict) -> Dict:
    """GraphTransformerGNN subtree: GraphTransformer_k -> BlockGraphTransformer_k."""
    out = {}
    for name, layer in ref_gnn.items():
        idx = name.rsplit("_", 1)[-1]
        qkvu_kernel = jnp.concatenate(
            [
                layer["Dense_0"]["kernel"],
                layer["Dense_1"]["kernel"],
                layer["Dense_2"]["kernel"],
                layer["Dense_4"]["kernel"],
            ],
            axis=1,
        )
        qkvu_bias = jnp.concatenate(
            [
                layer["Dense_0"]["bias"],
                layer["Dense_1"]["bias"],
                layer["Dense_2"]["bias"],
                layer["Dense_4"]["bias"],
            ],
            axis=0,
        )
        out[f"BlockGraphTransformer_{idx}"] = {
            "qkvu": {"kernel": qkvu_kernel, "bias": qkvu_bias},
            "edge": {"kernel": layer["Dense_3"]["kernel"]},
        }
    return out


def _remap_rnn(ref_rnn: Dict) -> Dict:
    """RNN subtree: renumber cells from 0 (reference numbering starts at 1)."""
    cells = sorted(ref_rnn.keys(), key=lambda n: int(n.rsplit("_", 1)[-1]))
    out = {}
    for i, name in enumerate(cells):
        prefix = name.rsplit("_", 1)[0]
        out[f"{prefix}_{i}"] = ref_rnn[name]
    return out


def _remap_subtree(tree: Dict) -> Dict:
    """Remap GNN/RNN children anywhere in a module subtree; copy the rest."""
    out = {}
    for name, child in tree.items():
        if name.startswith("GraphTransformerGNN"):
            out[name] = _remap_gnn(child)
        elif name.startswith("RNN"):
            out[name] = _remap_rnn(child)
        elif isinstance(child, dict):
            out[name] = _remap_subtree(child)
        else:
            out[name] = child
    return out


def remap_policy_params(ref_params: Dict) -> Dict:
    """Reference PPOPolicy params ('params' root) -> our PPOPolicy params."""
    root = ref_params["params"]
    out = {}
    for name, child in root.items():
        if name in ("OutputDenseMean", "OutputDenseStdTrans"):
            continue
        out[name] = _remap_subtree(child) if isinstance(child, dict) else child
    out["OutputDenseMeanStd"] = {
        "kernel": jnp.concatenate(
            [root["OutputDenseMean"]["kernel"], root["OutputDenseStdTrans"]["kernel"]], axis=1
        ),
        "bias": jnp.concatenate(
            [root["OutputDenseMean"]["bias"], root["OutputDenseStdTrans"]["bias"]], axis=0
        ),
    }
    return {"params": out}


def remap_value_params(ref_params: Dict) -> Dict:
    """Reference ValueNet (Vl or Vh) params -> ours (GNN fuse + RNN renumber)."""
    return {"params": _remap_subtree(ref_params["params"])}


def looks_like_reference_params(params: Dict) -> bool:
    """True if a pickled param tree uses the reference's (unfused) layout."""
    root = params.get("params", params)
    if "OutputDenseMean" in root:
        return True

    def has_unfused_gnn(tree):
        for name, child in tree.items():
            if name.startswith("GraphTransformerGNN") and any(
                c.startswith("GraphTransformer_") for c in child
            ):
                return True
            if isinstance(child, dict) and has_unfused_gnn(child):
                return True
        return False

    return has_unfused_gnn(root)


def load_reference_checkpoint(model_dir: str) -> Dict[str, Dict]:
    """Load a reference `models/<step>` directory into this framework's layouts.

    Returns {"policy": ..., "Vl": ..., ["Vh": ...]} ready for algo.load-style
    TrainState.replace.
    """
    import os
    import pickle

    out = {}
    with open(os.path.join(model_dir, "actor.pkl"), "rb") as f:
        out["policy"] = remap_policy_params(pickle.load(f))
    vl_path = os.path.join(model_dir, "Vl.pkl")
    if os.path.exists(vl_path):
        with open(vl_path, "rb") as f:
            out["Vl"] = remap_value_params(pickle.load(f))
    vh_path = os.path.join(model_dir, "Vh.pkl")
    if os.path.exists(vh_path):
        with open(vh_path, "rb") as f:
            out["Vh"] = remap_value_params(pickle.load(f))
    return out
