#!/usr/bin/env python
"""Export a trained mpqe_tpu run as a torch state_dict file.

The reverse of ``tools/import_torch_checkpoint.py`` — lets reference
(PyTorch) tooling consume models trained here::

    python tools/export_torch_checkpoint.py --run_dir runs/myrun \
        --out model.pt

Keys follow the same PyG/``RGCNConv`` naming the importer reads
(``rgcn.convs.{i}.{root,bias,weight,comp}``, ``enc.ent.weight``,
``mode_embeddings.weight``); ``import(export(p)) == p`` is pinned by
``tests/test_torch_import.py``.  MPQE checkpoints only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from mpqe_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--ckpt", default=None,
                   help="defaults to latest in run_dir/ckpt")
    p.add_argument("--out", required=True, help="output .pt file")
    args = p.parse_args(argv)

    import jax
    import torch

    from mpqe_tpu.data import torch_import as ti
    from mpqe_tpu.models import mpqe as mpqe_mod
    from mpqe_tpu.train import checkpoint as ckpt_mod
    from mpqe_tpu.train import loop as loop_mod

    with open(os.path.join(args.run_dir, "model_config.json")) as f:
        mc = json.load(f)
    run_cfg = {}
    cfg_path = os.path.join(args.run_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            run_cfg = json.load(f)
    if "readout" not in mc:
        raise SystemExit("GQE run dirs are not exportable (MPQE only)")
    cfg = mpqe_mod.MPQEConfig(
        n_entities=mc["n_entities"], n_modes=mc["n_modes"],
        n_rels=mc["n_rels"], embed_dim=mc["embed_dim"],
        n_layers=mc["n_layers"], num_bases=mc["num_bases"],
        readout=mc["readout"], margin=mc["margin"])
    template = loop_mod.init_train_state(
        jax.random.PRNGKey(0), cfg,
        loop_mod.train_config_from_run(run_cfg))
    ckpt = args.ckpt or ckpt_mod.latest_checkpoint(
        os.path.join(args.run_dir, "ckpt"))
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {args.run_dir}/ckpt")
    state = ckpt_mod.restore_checkpoint(ckpt, template)

    sd = {k: torch.from_numpy(v.copy())
          for k, v in ti.export_mpqe_state_dict(state.params).items()}
    torch.save(sd, args.out)
    print(json.dumps({"out": args.out, "keys": len(sd),
                      "step": state.step}))


if __name__ == "__main__":
    main()
