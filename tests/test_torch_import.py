"""Torch (reference) checkpoint import — mpqe_tpu/data/torch_import.py.

The reference's trained artifact is a ``torch.save``d ``state_dict``
(SURVEY.md §5).  These tests build synthetic state dicts in the
documented PyG/``RGCNConv`` naming (the mount is empty — the convention
is the import module's contract, overridable by key map) and pin the
classifier's placements array-for-array.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mpqe_tpu.data import torch_import as ti  # noqa: E402
from mpqe_tpu.models import mpqe as mpqe_mod  # noqa: E402

D, L, NB = 16, 2, 4
N_ENT, N_MODES = 50, 3


def _layer_keys(i, n_rels, num_bases):
    g = torch.Generator().manual_seed(100 + i)
    keys = {
        f"rgcn.convs.{i}.root": torch.randn(D, D, generator=g),
        f"rgcn.convs.{i}.bias": torch.randn(D, generator=g),
    }
    if num_bases:
        keys[f"rgcn.convs.{i}.weight"] = torch.randn(
            num_bases, D, D, generator=g)
        keys[f"rgcn.convs.{i}.comp"] = torch.randn(
            n_rels, num_bases, generator=g)
    else:
        keys[f"rgcn.convs.{i}.weight"] = torch.randn(
            n_rels, D, D, generator=g)
    return keys


def _basis_sd(n_rels=8, num_bases=NB):
    g = torch.Generator().manual_seed(0)
    sd = {
        "enc.ent.weight": torch.randn(N_ENT, D, generator=g),
        "mode_embeddings.weight": torch.randn(N_MODES, D, generator=g),
    }
    for i in range(L):
        sd.update(_layer_keys(i, n_rels, num_bases))
    return sd


def _cfg(n_rels=8, num_bases=NB, readout="tgt"):
    return mpqe_mod.MPQEConfig(
        n_entities=N_ENT, n_modes=N_MODES, n_rels=n_rels, embed_dim=D,
        n_layers=L, num_bases=num_bases, readout=readout)


def _import(sd, cfg, **kw):
    import jax

    np_sd = {k: v.numpy() for k, v in sd.items()}
    kw.setdefault("mode_names", ("alpha", "beta", "gamma"))
    return ti.import_mpqe_params(np_sd, cfg, jax.random.PRNGKey(0), **kw)


def test_infer_shape_basis_and_full():
    s = ti.infer_model_shape({k: v.numpy() for k, v in _basis_sd().items()})
    assert (s.embed_dim, s.n_layers, s.n_rels, s.num_bases) == (D, L, 8, NB)
    s = ti.infer_model_shape(
        {k: v.numpy() for k, v in _basis_sd(num_bases=None).items()})
    assert (s.embed_dim, s.n_layers, s.n_rels, s.num_bases) == (D, L, 8, None)


def test_basis_state_dict_placements():
    sd = _basis_sd()
    params, rep = _import(sd, _cfg())
    assert not rep.missing and not rep.unused_keys
    np.testing.assert_array_equal(
        np.asarray(params["emb"]["ent"]), sd["enc.ent.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["emb"]["var"]),
        sd["mode_embeddings.weight"].numpy())
    for i in range(L):
        lp = params["layers"][i]
        np.testing.assert_array_equal(
            np.asarray(lp["w_self"]), sd[f"rgcn.convs.{i}.root"].numpy())
        np.testing.assert_array_equal(
            np.asarray(lp["bias"]), sd[f"rgcn.convs.{i}.bias"].numpy())
        np.testing.assert_array_equal(
            np.asarray(lp["basis"]), sd[f"rgcn.convs.{i}.weight"].numpy())
        np.testing.assert_array_equal(
            np.asarray(lp["coeff"]), sd[f"rgcn.convs.{i}.comp"].numpy())


def test_full_weight_state_dict():
    sd = _basis_sd(num_bases=None)
    params, rep = _import(sd, _cfg(num_bases=None))
    assert not rep.missing
    np.testing.assert_array_equal(
        np.asarray(params["layers"][1]["w_rel"]),
        sd["rgcn.convs.1.weight"].numpy())


def test_per_mode_entity_tables_and_var_rows():
    """The reference's load_graph builds one nn.Embedding per mode; rows
    land in the global table through node_maps (list AND dict forms)."""
    modes = ("alpha", "beta", "gamma")
    rng = np.random.default_rng(0)
    ids = np.arange(N_ENT)
    rng.shuffle(ids)
    node_maps_list = {
        "alpha": ids[:20].tolist(),
        "beta": ids[20:35].tolist(),
        "gamma": ids[35:].tolist(),
    }
    sd = {}
    for i in range(L):
        sd.update(_layer_keys(i, 8, NB))
    g = torch.Generator().manual_seed(7)
    for m in modes:
        sd[f"enc.features.{m}.weight"] = torch.randn(
            len(node_maps_list[m]), D, generator=g)
        sd[f"enc.vars.{m}.weight"] = torch.randn(1, D, generator=g)

    for node_maps in (
        node_maps_list,
        {m: {int(gid): j for j, gid in enumerate(v)}
         for m, v in node_maps_list.items()},
    ):
        params, rep = _import(sd, _cfg(), mode_names=modes,
                              node_maps=node_maps)
        assert not rep.missing
        ent = np.asarray(params["emb"]["ent"])
        for m in modes:
            np.testing.assert_array_equal(
                ent[np.asarray(node_maps_list[m])],
                sd[f"enc.features.{m}.weight"].numpy())
        var = np.asarray(params["emb"]["var"])
        for mi, m in enumerate(modes):
            np.testing.assert_array_equal(
                var[mi], sd[f"enc.vars.{m}.weight"].numpy()[0])


def test_missing_params_raise_and_allow_partial():
    sd = _basis_sd()
    del sd["enc.ent.weight"]
    with pytest.raises(ValueError, match="emb.ent"):
        _import(sd, _cfg())
    params, rep = _import(sd, _cfg(), allow_partial=True)
    assert rep.missing == ["emb.ent"]


def test_per_mode_tables_require_node_maps():
    sd = _basis_sd()
    del sd["enc.ent.weight"]
    sd["enc.features.alpha.weight"] = torch.randn(20, D)
    sd["enc.features.beta.weight"] = torch.randn(15, D)
    sd["enc.features.gamma.weight"] = torch.randn(15, D)
    with pytest.raises(ValueError, match="node_maps"):
        _import(sd, _cfg())


def test_key_map_transpose_and_rel_perm():
    sd = _basis_sd()
    # a torch nn.Linear-style [out, in] tensor mapped explicitly
    lin = torch.randn(D, D)
    sd["readout.pre.weight"] = lin
    cfg = _cfg(readout="mlp")
    key_map = {
        "readout.w_pre": {"key": "readout.pre.weight", "transpose": True},
    }
    params, rep = _import(sd, cfg, key_map=key_map, allow_partial=True)
    np.testing.assert_array_equal(
        np.asarray(params["readout"]["w_pre"]), lin.numpy().T)
    assert "readout.w_post" in rep.missing  # unmapped mlp half reported

    perm = np.asarray([3, 2, 1, 0, 7, 6, 5, 4])
    params, _ = _import(_basis_sd(), _cfg(), rel_perm=perm)
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["coeff"]),
        _basis_sd()["rgcn.convs.0.comp"].numpy()[perm])


def test_export_import_round_trip():
    """export_mpqe_state_dict -> import_mpqe_params is the identity, for
    both basis and full-weight layers."""
    import jax

    for num_bases in (NB, None):
        cfg = _cfg(num_bases=num_bases)
        params = mpqe_mod.init_mpqe(jax.random.PRNGKey(3), cfg)
        sd = ti.export_mpqe_state_dict(params)
        back, rep = ti.import_mpqe_params(
            sd, cfg, jax.random.PRNGKey(99),
            mode_names=("alpha", "beta", "gamma"))
        assert not rep.missing and not rep.unused_keys
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli_round_trip(tmp_path):
    """Trained run dir -> .pt -> torch.load has the documented keys."""
    import sys

    import jax

    sys.path.insert(0, "tools")
    import export_torch_checkpoint as ecli  # noqa: E402

    from mpqe_tpu.train import checkpoint as ckpt_mod
    from mpqe_tpu.train import loop as loop_mod
    from mpqe_tpu.train.metrics import MetricsWriter

    cfg = _cfg()
    run_dir = str(tmp_path / "run")
    m = MetricsWriter(run_dir)
    import dataclasses

    m.write_config(dataclasses.asdict(cfg), "model_config.json")
    m.close()
    state = loop_mod.init_train_state(
        jax.random.PRNGKey(5), cfg, loop_mod.TrainConfig())
    ckpt_mod.save_checkpoint(os.path.join(run_dir, "ckpt"), state)

    out = str(tmp_path / "model.pt")
    ecli.main(["--run_dir", run_dir, "--out", out])
    sd = torch.load(out, weights_only=True)
    assert "enc.ent.weight" in sd and "rgcn.convs.1.comp" in sd
    np.testing.assert_array_equal(
        sd["enc.ent.weight"].numpy(),
        np.asarray(state.params["emb"]["ent"]))


def test_cli_end_to_end(tmp_path):
    """state_dict file -> run dir -> evaluate.py consumes it."""
    import sys

    import jax

    import evaluate as eval_mod
    import train as train_mod

    sys.path.insert(0, "tools")
    import import_torch_checkpoint as cli  # noqa: E402

    targs = train_mod.parse_args([
        "--data", "synthetic", "--seed", "0",
        "--syn_entities", "200", "--syn_modes", "3", "--syn_rels", "6",
        "--syn_triples", "600", "--syn_train_queries", "100",
        "--syn_val_queries", "20"])
    kg, _, _ = train_mod.load_data(targs)

    g = torch.Generator().manual_seed(1)
    sd = {
        "enc.ent.weight": torch.randn(kg.n_entities, D, generator=g),
        "mode_embeddings.weight": torch.randn(kg.n_modes, D, generator=g),
    }
    for i in range(L):
        sd.update(_layer_keys(i, kg.n_rels, NB))
    ckpt_path = str(tmp_path / "reference_model.pt")
    torch.save(sd, ckpt_path)

    out = str(tmp_path / "imported")
    cli.main(["--ckpt", ckpt_path, "--data", "synthetic", "--out", out,
              "--seed", "0"])
    assert os.path.exists(os.path.join(out, "model_config.json"))
    with open(os.path.join(out, "model_config.json")) as f:
        mc = json.load(f)
    assert mc["num_bases"] == NB and mc["embed_dim"] == D

    # the imported params survive the Orbax round trip bit-for-bit
    from mpqe_tpu.train import checkpoint as ckpt_mod
    from mpqe_tpu.train import loop as loop_mod

    cfg = _cfg.__wrapped__ if hasattr(_cfg, "__wrapped__") else None
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=D, n_layers=L, num_bases=NB, readout="tgt")
    template = loop_mod.init_train_state(
        jax.random.PRNGKey(0), cfg, loop_mod.TrainConfig())
    state = ckpt_mod.restore_checkpoint(
        ckpt_mod.latest_checkpoint(os.path.join(out, "ckpt")), template)
    np.testing.assert_array_equal(
        np.asarray(state.params["emb"]["ent"]),
        sd["enc.ent.weight"].numpy())

    # and evaluate.py accepts the run dir as-is
    eval_mod.main(["--run_dir", out, "--n_neg", "8"])


def test_dict_node_maps_must_be_dense_permutation():
    """{global: local} maps with gapped/duplicate local rows used to
    scatter embedding rows through uninitialized indices — now a hard
    error."""
    modes = ("alpha", "beta", "gamma")
    sd = {}
    for i in range(L):
        sd.update(_layer_keys(i, 8, NB))
    sd["enc.features.alpha.weight"] = torch.randn(3, D)
    sd["enc.features.beta.weight"] = torch.randn(2, D)
    sd["enc.features.gamma.weight"] = torch.randn(2, D)
    sd["enc.vars.alpha.weight"] = torch.randn(1, D)
    sd["enc.vars.beta.weight"] = torch.randn(1, D)
    sd["enc.vars.gamma.weight"] = torch.randn(1, D)
    bad = {"alpha": {10: 0, 11: 2, 12: 3},  # local row 1 missing
           "beta": {0: 0, 1: 1}, "gamma": {2: 0, 3: 1}}
    with pytest.raises(ValueError, match="dense 0..n-1"):
        _import(sd, _cfg(), mode_names=modes, node_maps=bad)


def test_mode_named_table_not_misclassified_as_var():
    """A per-mode entity table with exactly n_modes rows must stay an
    entity table (its key names a mode), not become emb.var."""
    modes = ("alpha", "beta", "gamma")
    sd = {}
    for i in range(L):
        sd.update(_layer_keys(i, 8, NB))
    # alpha's ENTITY table happens to have n_modes == 3 rows
    sd["enc.features.alpha.weight"] = torch.randn(N_MODES, D)
    sd["enc.features.beta.weight"] = torch.randn(2, D)
    sd["enc.features.gamma.weight"] = torch.randn(2, D)
    sd["enc.vars.alpha.weight"] = torch.randn(1, D)
    sd["enc.vars.beta.weight"] = torch.randn(1, D)
    sd["enc.vars.gamma.weight"] = torch.randn(1, D)
    node_maps = {"alpha": [0, 1, 2], "beta": [3, 4], "gamma": [5, 6]}
    cfg = mpqe_mod.MPQEConfig(
        n_entities=7, n_modes=N_MODES, n_rels=8, embed_dim=D,
        n_layers=L, num_bases=NB, readout="tgt")
    import jax

    params, rep = ti.import_mpqe_params(
        {k: v.numpy() for k, v in sd.items()}, cfg, jax.random.PRNGKey(0),
        mode_names=modes, node_maps=node_maps)
    assert not rep.missing
    np.testing.assert_array_equal(
        np.asarray(params["emb"]["ent"])[:3],
        sd["enc.features.alpha.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["emb"]["var"])[0],
        sd["enc.vars.alpha.weight"].numpy()[0])


def test_cli_shape_overrides_with_map_only_checkpoint(tmp_path):
    """Layer keys that don't match the PyG regex import through --map +
    explicit shape flags (this workflow used to be unreachable: shape
    inference raised before --map was read)."""
    import sys

    import train as train_mod

    sys.path.insert(0, "tools")
    import import_torch_checkpoint as cli  # noqa: E402

    targs = train_mod.parse_args([
        "--data", "synthetic", "--seed", "0",
        "--syn_entities", "200", "--syn_modes", "3", "--syn_rels", "6",
        "--syn_triples", "600", "--syn_train_queries", "100",
        "--syn_val_queries", "20"])
    kg, _, _ = train_mod.load_data(targs)
    g = torch.Generator().manual_seed(2)
    sd = {
        "entity_table": torch.randn(kg.n_entities, D, generator=g),
        "var_table": torch.randn(kg.n_modes, D, generator=g),
        "oddly.named.self0": torch.randn(D, D, generator=g),
        "oddly.named.bias0": torch.randn(D, generator=g),
        "oddly.named.basis0": torch.randn(NB, D, D, generator=g),
        "oddly.named.coeff0": torch.randn(kg.n_rels, NB, generator=g),
    }
    ckpt = str(tmp_path / "odd.pt")
    torch.save(sd, ckpt)
    key_map = {
        "emb.ent": {"key": "entity_table"},
        "emb.var": {"key": "var_table"},
        "layers.0.w_self": {"key": "oddly.named.self0"},
        "layers.0.bias": {"key": "oddly.named.bias0"},
        "layers.0.basis": {"key": "oddly.named.basis0"},
        "layers.0.coeff": {"key": "oddly.named.coeff0"},
    }
    map_path = str(tmp_path / "map.json")
    with open(map_path, "w") as f:
        json.dump(key_map, f)
    out = str(tmp_path / "imported")
    cli.main(["--ckpt", ckpt, "--data", "synthetic", "--out", out,
              "--map", map_path, "--embed_dim", str(D), "--n_layers", "1",
              "--num_bases", str(NB)])
    with open(os.path.join(out, "model_config.json")) as f:
        mc = json.load(f)
    assert mc["n_layers"] == 1 and mc["num_bases"] == NB
