"""End-to-end CLI smoke tests on the in-repo fixtures (tiny settings)."""
import os
import tempfile

import numpy as np
import pytest

from str2str_tpu.config.core import load_config

CACHE = tempfile.mkdtemp(prefix="e2e_cache_")

FAST_DIFFUSER = [
    "model.diffuser.rotation.num_sigma=50",
    "model.diffuser.rotation.num_omega=100",
    "model.diffuser.rotation.n_terms=300",
    f"model.diffuser.rotation.cache_dir={CACHE}",
]


def test_config_composition_and_overrides():
    cfg = load_config("eval", ["model.inference.n_replica=7", "data=protein"])
    assert cfg.model.inference.n_replica == 7
    assert cfg.data.dataset.suffix == "pkl"  # group swapped
    cfg2 = load_config("train", ["trainer=cpu"])
    assert cfg2.trainer.max_steps == 20
    assert cfg2.model.net.node_embed_size == 256


@pytest.mark.slow
def test_sample_cli_end_to_end(tmp_path, fixture_pdb):
    from str2str_tpu.cli.sample import main as sample_main
    from str2str_tpu.io import protein as prot_io

    out = sample_main([
        f"data.dataset.path_to_dataset={fixture_pdb}",
        f"model.inference.output_dir={tmp_path}/samples",
        "model.inference.n_replica=3",
        "model.inference.replica_per_batch=3",
        "model.inference.num_timesteps=10",
        "model.inference.delta_min=0.3",
        "model.inference.delta_max=0.4",
        "model.inference.delta_step=0.1",
        "data.buckets=[16]",
        *FAST_DIFFUSER,
    ])
    merged = os.path.join(out, "CLN025.pdb")
    assert os.path.exists(merged)
    models = prot_io.parse_pdb_models(open(merged).read())
    assert len(models) == 6  # 3 replicas x 2 deltas
    assert models[0].num_residues == 10
    for m in models:
        assert np.isfinite(m.atom_positions).all()


@pytest.mark.slow
def test_sample_cli_chained_end_to_end(tmp_path, fixture_pdb):
    """model.inference.chained=true: same CLI surface, one compiled program
    for the whole delta grid."""
    from str2str_tpu.cli.sample import main as sample_main
    from str2str_tpu.io import protein as prot_io

    out = sample_main([
        f"data.dataset.path_to_dataset={fixture_pdb}",
        f"model.inference.output_dir={tmp_path}/samples",
        "model.inference.n_replica=3",
        "model.inference.replica_per_batch=3",
        "model.inference.num_timesteps=10",
        "model.inference.delta_min=0.3",
        "model.inference.delta_max=0.4",
        "model.inference.delta_step=0.1",
        "model.inference.chained=true",
        "data.buckets=[16]",
        *FAST_DIFFUSER,
    ])
    merged = os.path.join(out, "CLN025.pdb")
    models = prot_io.parse_pdb_models(open(merged).read())
    assert len(models) == 6  # 3 replicas x 2 deltas
    for m in models:
        assert np.isfinite(m.atom_positions).all()


def test_evaluate_cli(tmp_path, fixture_pdb, rng):
    """Metrics path: fake a prediction ensemble + target ensemble."""
    from str2str_tpu.cli.evaluate import evaluate_prediction
    from str2str_tpu.io import pdb as pdb_io
    from str2str_tpu.io import protein as prot_io

    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    pred_dir, target_dir = tmp_path / "pred", tmp_path / "target"
    for d, n, noise in ((pred_dir, 30, 0.4), (target_dir, 60, 0.35)):
        ens = prot.atom_positions[None] + noise * rng.randn(n, 1, 1, 3).astype(np.float32) \
            + 0.1 * rng.randn(n, prot.num_residues, 37, 3).astype(np.float32)
        pdb_io.atom37_to_pdb(ens, str(d / "CLN025.pdb"), aatype=prot.aatype,
                             residue_index=prot.residue_index,
                             atom_mask=prot.atom_mask)
    csv_path = evaluate_prediction(str(pred_dir), str(target_dir),
                                   str(tmp_path / "eval"))
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0].startswith("target\tval_clash")
    assert lines[-1].startswith("MEAN")
    assert len(lines) == 3  # header + CLN025 + MEAN


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """Two tiny training steps over the fixture PDBs on the CPU mesh."""
    from str2str_tpu.cli.train import main as train_main

    result = train_main([
        "trainer=cpu",
        "data.dataset.path_to_dataset=testdata",
        "data.dataset.suffix=pdb",
        "data.batch_size=2",
        "data.buckets=[96]",
        "data.dataset.metadata_filter=null",
        "trainer.max_epochs=1",
        "trainer.max_steps=2",
        "trainer.log_every_n_steps=1",
        "trainer.num_devices=1",
        f"paths.output_dir={tmp_path}",
        *FAST_DIFFUSER,
    ])
    assert result["step"] == 2
    hist = result["history"]
    assert np.isfinite(hist[-1]["train/loss"])


def test_sweep_cli(tmp_path, monkeypatch):
    """Random-search sweep over config overrides (reference Optuna-sweeper
    capability, configs/hparams_search/optuna.yaml): runs trials, writes
    trials.csv + best.json, picks the best metric."""
    from str2str_tpu.cli import sweep as sweep_cli

    calls = []

    def fake_trial(overrides, metric):
        calls.append(overrides)
        lr = float([o.split("=")[1] for o in overrides
                    if o.startswith("model.optimizer.lr=")][0])
        return abs(lr - 3e-3)  # best at lr ~= 3e-3

    monkeypatch.setattr(sweep_cli, "run_trial", fake_trial)
    summary = sweep_cli.main([
        "--n-trials", "12", "--metric", "val/loss", "--direction", "minimize",
        "--param", "model.optimizer.lr=interval(1e-5, 1e-1)",
        "--out-dir", str(tmp_path / "sweep"),
        "trainer.max_epochs=1",
    ])
    assert len(calls) == 12
    assert all("trainer.max_epochs=1" in c for c in calls)
    assert (tmp_path / "sweep" / "trials.csv").exists()
    assert (tmp_path / "sweep" / "best.json").exists()
    lr = summary["best_params"]["model.optimizer.lr"]
    assert 1e-5 <= lr <= 1e-1
    # grid sampler over a discrete axis
    summary2 = sweep_cli.main([
        "--sampler", "grid", "--n-trials", "10", "--metric", "val/loss",
        "--param", "model.optimizer.lr=choice(0.001, 0.003, 0.01)",
        "--out-dir", str(tmp_path / "sweep2")])
    assert float(summary2["best_params"]["model.optimizer.lr"]) == 0.003


def test_experiment_and_debug_config_groups():
    """experiment=/debug= override files merge at the config ROOT
    (`_global_: true` == Hydra's `@package _global_`; reference
    configs/experiment/example.yaml, configs/debug/default.yaml)."""
    from str2str_tpu.config.core import load_config

    cfg = load_config("train", ["experiment=example"])
    assert cfg.seed == 42
    assert cfg.data.batch_size == 4
    assert cfg.trainer.min_epochs == 500 and cfg.trainer.max_epochs == 1000
    assert cfg.callbacks.model_checkpoint.save_top_k == -1
    assert cfg.callbacks.model_checkpoint.every_n_epochs == 10
    # non-overridden keys survive
    assert cfg.model.net.node_embed_size == 256

    cfg2 = load_config("train", ["debug=default"])
    assert cfg2.trainer.detect_anomaly is True
    assert cfg2.trainer.max_epochs == 1
    assert cfg2.get("callbacks") is None and cfg2.get("logger") is None


def test_debug_profile_groups():
    """debug/{fdr,limit,overfit,profiler} compose via in-group defaults
    inheritance (reference configs/debug/fdr.yaml:5 `defaults: [default]`)."""
    from str2str_tpu.config.core import load_config

    fdr = load_config("train", ["debug=fdr"])
    assert fdr.trainer.max_steps == 1 and fdr.trainer.limit_val_batches == 1
    assert fdr.trainer.detect_anomaly is True  # inherited from debug/default

    lim = load_config("train", ["debug=limit"])
    assert lim.trainer.limit_train_batches == 0.01
    assert lim.trainer.limit_val_batches == 0.05
    assert lim.trainer.max_epochs == 3

    ov = load_config("train", ["debug=overfit"])
    assert ov.trainer.overfit_batches == 3
    assert ov.get("callbacks") is None

    pr = load_config("train", ["debug=profiler"])
    assert pr.trainer.profile is True and pr.trainer.max_epochs == 1


def test_callbacks_and_extras_groups():
    from str2str_tpu.config.core import load_config

    cfg = load_config("train", [])
    assert cfg.callbacks.early_stopping.patience == 100
    assert cfg.callbacks.model_checkpoint.monitor == "val/loss"
    assert cfg.callbacks.model_summary.max_depth == 1
    assert cfg.extras.enforce_tags is True and cfg.extras.print_config is True

    none = load_config("train", ["callbacks=none"])
    assert not none.get("callbacks")


def test_logger_group_backends_degrade(tmp_path):
    """mlflow/neptune/comet/aim logger groups compose and degrade to no-ops
    when their packages are absent (reference configs/logger/*.yaml)."""
    from str2str_tpu.config.core import Config, load_config
    from str2str_tpu.utils.metrics_logger import build_loggers

    for name in ("mlflow", "neptune", "comet", "aim"):
        cfg = load_config("train", [f"logger={name}",
                                    f"paths.output_dir={tmp_path}"])
        lg = build_loggers(cfg)
        lg.log_metrics({"step": 1, "train/loss": 1.0})
        lg.log_hyperparams({"lr": 1e-4})
        lg.finalize()

    # logger: null (debug profiles) disables logging entirely
    assert build_loggers(Config({"logger": None})).loggers == []


def test_sweep_from_config(tmp_path, monkeypatch):
    """--from-config loads the hparams_search group (reference
    configs/hparams_search surface)."""
    from str2str_tpu.cli import sweep as sweep_cli

    calls = []
    monkeypatch.setattr(sweep_cli, "run_trial",
                        lambda ov, m: float(len(calls) or calls.append(ov) or 1))
    summary = sweep_cli.main(["--from-config", "random", "--n-trials", "3",
                              "--out-dir", str(tmp_path)])
    assert summary["metric"] == "val/loss"
    assert (tmp_path / "trials.csv").exists()


def test_config_tree_dump(tmp_path):
    from str2str_tpu.config.core import dump_config_tree, load_config

    cfg = load_config("train", [])
    dump_config_tree(cfg, str(tmp_path))
    text = (tmp_path / "config_tree.log").read_text()
    assert "model:" in text and "node_embed_size: 256" in text


def test_tpe_sampler_concentrates_on_optimum():
    """The first-party TPE sampler (reference Optuna-TPESampler equivalent,
    configs/hparams_search/optuna.yaml:17-21) must adaptively concentrate
    proposals near the optimum of a smooth 1-D objective."""
    import numpy as np
    from str2str_tpu.cli.sweep import TPESampler, parse_space

    space = parse_space(["x=interval(0.0, 1.0)"])
    rng = np.random.RandomState(0)
    tpe = TPESampler(space, rng, direction_sign=1.0, n_startup=8)

    def f(x):
        return (x - 0.3) ** 2

    proposals = []
    for i in range(60):
        p = tpe.suggest()
        proposals.append(p["x"])
        tpe.tell(p, f(p["x"]))

    early = np.asarray(proposals[:10])
    late = np.asarray(proposals[-20:])
    # Late proposals should be much closer to the optimum than the random
    # startup phase, and best-found should be near 0.3.
    assert np.mean(np.abs(late - 0.3)) < np.mean(np.abs(early - 0.3)) * 0.7
    best = min(proposals, key=f)
    assert abs(best - 0.3) < 0.05


def test_tpe_sampler_categorical():
    import numpy as np
    from str2str_tpu.cli.sweep import TPESampler, parse_space

    space = parse_space(["b=choice(1, 2, 4, 8)"])
    rng = np.random.RandomState(1)
    tpe = TPESampler(space, rng, direction_sign=1.0, n_startup=6)
    for i in range(40):
        p = tpe.suggest()
        tpe.tell(p, 0.0 if p["b"] == "4" else 1.0)
    late = [tpe.suggest()["b"] for _ in range(20)]
    assert late.count("4") >= 12, late


@pytest.mark.slow
def test_trained_checkpoint_fixture_samples(tmp_path, fixture_pdb):
    """The committed trained checkpoint (checkpoints/trained_r3.npz, best
    val/loss 3.11 at epoch 389 of the round-3 training run on the 13
    in-repo targets) loads through factory.load_params and drives a short
    sampling run to finite structures."""
    import numpy as np
    import jax
    from str2str_tpu.config.core import load_config
    from str2str_tpu.data.featurize import FeaturizeConfig, featurize_padded
    from str2str_tpu.factory import (build_diffuser, build_network,
                                     build_sampler, load_params)
    from str2str_tpu.io import protein as prot_io
    from str2str_tpu.sampling.sampler import build_schedule

    from pathlib import Path
    ckpt = Path(__file__).resolve().parents[1] / "checkpoints/trained_r3.npz"
    assert ckpt.exists()
    cfg = load_config("eval", [f"ckpt_path={ckpt}",
                               "model.inference.num_timesteps=8",
                               "model.inference.replica_per_batch=2"])
    net = build_network(cfg)
    sampler = build_sampler(cfg, net, build_diffuser(cfg))
    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    feats = featurize_padded(
        prot, FeaturizeConfig(strip_missing_residues=True,
                              recenter_and_scale=False), bucket=16)
    params = load_params(cfg, net)

    # param tree must match the network's own structure exactly
    from str2str_tpu.cli.sample import example_net_batch
    ref = net.init(jax.random.PRNGKey(0), example_net_batch(feats))
    ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths

    ts, dt, active = build_schedule(np.asarray([0.3, 0.5], np.float32), 8, 0.01)
    batch = {k: np.broadcast_to(v, (2,) + v.shape)
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    out = sampler.run(params, jax.random.PRNGKey(0), batch, ts, dt, active)
    a37 = np.asarray(out["atom37"])
    assert np.isfinite(a37).all()
