"""Training CLI: denoising score-matching on preprocessed PDB data.

Equivalent of the reference `python src/train.py` (train.py:43-108) without
Lightning: seeds, datasets with a deterministic train/val split, the jitted
SPMD trainer, checkpointing, CSV logs.

Usage:
    TRAIN_DATA=/path/to/pkls python -m str2str_tpu.cli.train \
        trainer.max_epochs=100 data.batch_size=8 [...]
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..config.core import load_config, parse_cli
from ..data.dataset import BucketedLoader, MetadataFilter, ProteinDataset, split_dataset
from ..data.featurize import FeaturizeConfig
from ..factory import build_diffuser, build_network
from ..training.losses import loss_config_from
from ..training.trainer import TrainConfig, Trainer
from ..utils.logging import get_logger
from ..utils.metrics_logger import build_loggers
from ..utils.task import extras, finalize_on_exit, print_config_enabled, \
    set_crash_dir, task_wrapper

log = get_logger(__name__)


@task_wrapper
def main(argv=None):
    from ..utils.jax_setup import setup as _jax_setup
    _jax_setup()
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "train", overrides)
    extras(cfg)

    t_cfg = cfg.data.dataset.transform
    ds = ProteinDataset(
        str(cfg.data.dataset.path_to_dataset),
        suffix=cfg.data.dataset.get("suffix", "pkl"),
        transform=FeaturizeConfig(
            strip_missing_residues=t_cfg.strip_missing_residues,
            recenter_and_scale=t_cfg.recenter_and_scale,
            truncate_length=t_cfg.truncate_length),
        metadata_filter=MetadataFilter(
            **(cfg.data.dataset.get("metadata_filter") or {})),
        seed=cfg.data.get("generator_seed", 42),
        # Same accession filter the sampling CLI honors — e.g. holdout
        # training that excludes evaluation targets by listing the rest.
        accession_codes=cfg.data.dataset.get("accession_code_filter"),
        path_to_seq_embedding=cfg.data.dataset.get("path_to_seq_embedding"))
    train_idx, val_idx = split_dataset(
        len(ds), tuple(cfg.data.get("train_val_split", (0.95, 0.05))),
        seed=cfg.data.get("generator_seed", 42))
    log.info(f"dataset: {len(ds)} examples -> {len(train_idx)} train / {len(val_idx)} val")

    buckets = tuple(cfg.data.get("buckets", (64, 128, 256, 384, 512)))
    workers = int(cfg.data.get("num_workers", 0))
    train_loader = BucketedLoader(ds, train_idx, cfg.data.batch_size,
                                  buckets=buckets, shuffle=cfg.data.get("shuffle", True),
                                  seed=cfg.data.get("generator_seed", 42),
                                  num_workers=workers)
    val_loader = (BucketedLoader(ds, val_idx, cfg.data.batch_size,
                                 buckets=buckets, shuffle=False,
                                 num_workers=workers)
                  if len(val_idx) else None)

    net = build_network(cfg)
    diffuser = build_diffuser(cfg)
    tr = cfg.trainer

    # Callbacks group (reference configs/callbacks/*): maps onto trainer
    # knobs — model_checkpoint -> best/periodic checkpoints, early_stopping
    # -> patience. `callbacks=none` / `callbacks: null` (debug profiles)
    # disables both.
    es_patience = tr.get("early_stopping_patience", 100)
    save_best = tr.get("save_best", True)
    ckpt_every = tr.get("ckpt_every_n_epochs", 1)
    keep_ckpts = tr.get("keep_ckpts", 3)
    if "callbacks" in cfg:
        cb = cfg.get("callbacks") or {}
        es = cb.get("early_stopping") if hasattr(cb, "get") else None
        es_patience = int(es.get("patience", 100)) if es else -1
        mc = cb.get("model_checkpoint") if hasattr(cb, "get") else None
        save_best = bool(mc) and mc.get("monitor") is not None
        if mc:
            ckpt_every = int(mc.get("every_n_epochs") or ckpt_every)
            if mc.get("save_top_k"):
                keep_ckpts = int(mc["save_top_k"])
    trainer = Trainer(
        net, diffuser, loss_config_from(cfg),
        TrainConfig(
            lr=float(cfg.model.optimizer.lr),
            weight_decay=cfg.model.optimizer.get("weight_decay", 0.0),
            grad_clip=cfg.model.optimizer.get("grad_clip"),
            plateau_factor=cfg.model.scheduler.get("factor", 0.1),
            plateau_patience=cfg.model.scheduler.get("patience", 10),
            min_lr=float(cfg.model.scheduler.get("min_lr", 1e-8)),
            max_epochs=tr.max_epochs, max_steps=tr.get("max_steps", -1),
            max_time=str(tr.get("max_time", "") or ""),
            min_epochs=int(tr.get("min_epochs", 1) or 1),
            seed=cfg.get("seed", 0) or 0, num_devices=tr.get("num_devices", -1),
            log_every_n_steps=tr.get("log_every_n_steps", 50),
            val_every_n_epochs=tr.get("val_every_n_epochs", 1),
            ckpt_every_n_epochs=ckpt_every,
            keep_ckpts=keep_ckpts,
            gradient_accumulation=tr.get("gradient_accumulation", 1),
            use_fused_kernels=tr.get("use_fused_kernels", True),
            steps_per_call=tr.get("steps_per_call", 1),
            early_stopping_patience=es_patience,
            save_best=save_best,
            limit_train_batches=tr.get("limit_train_batches", 1.0),
            limit_val_batches=tr.get("limit_val_batches", 1.0),
            overfit_batches=int(tr.get("overfit_batches", 0) or 0),
            seq_devices=int(tr.get("seq_devices", 1) or 1),
            detect_anomaly=tr.get("detect_anomaly", False),
            profile_dir=(str(cfg.paths.log_dir) + "/profile") if tr.get("profile") else ""),
        log_dir=str(cfg.paths.log_dir),
        ckpt_dir=str(Path(str(cfg.paths.output_dir)) / "ckpt"),
        loggers=build_loggers(cfg))
    set_crash_dir(str(cfg.paths.log_dir))
    finalize_on_exit(trainer.loggers)
    if print_config_enabled(cfg):
        from ..config.core import dump_config_tree
        dump_config_tree(cfg, str(cfg.paths.log_dir))

    # Initialize params from the first batch's shapes.
    import jax
    first = next(iter(train_loader))
    from ..parallel import mesh as mesh_lib
    example = {k: v for k, v in first.items() if isinstance(v, np.ndarray)}
    init_batch = {
        "rigids_t": np.tile(np.asarray([1.0, 0, 0, 0, 0, 0, 0], np.float32),
                            (example["aatype"].shape[0], example["aatype"].shape[1], 1)),
        "t": np.full((example["aatype"].shape[0],), 0.5, np.float32),
        "residue_idx": example["residue_idx"],
        "residue_mask": example["residue_mask"],
        "fixed_mask": example["fixed_mask"],
        "sc_ca_t": example["sc_ca_t"],
        "torsion_angles_sin_cos": example["torsion_angles_sin_cos"],
        "aatype": example["aatype"],
    }
    ckpt_path = cfg.get("ckpt_path")
    if ckpt_path:
        from ..factory import load_params
        params = load_params(cfg, net)
        log.info(f"loaded checkpoint {ckpt_path}")
    else:
        params = trainer.net.init(jax.random.PRNGKey(cfg.get("seed", 0) or 0), init_batch)

    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    log.info(f"model: {n / 1e6:.2f}M params; mesh: {trainer.mesh.shape}")
    # Hyperparameter + parameter-count logging (reference
    # logging_utils.log_hyperparameters, logging_utils.py:12-57).
    trainer.loggers.log_hyperparams({
        "model/params_total": n,
        "task_name": cfg.get("task_name", "train"),
        "seed": cfg.get("seed", 0),
        "data/batch_size": cfg.data.batch_size,
        "data/buckets": list(buckets),
        "optimizer/lr": float(cfg.model.optimizer.lr),
        "trainer/max_epochs": tr.max_epochs,
        "net/dtype": cfg.model.net.get("dtype", "float32"),
    })

    result = trainer.fit(params, train_loader, val_loader,
                         resume_from=cfg.get("resume_from") or None)
    log.info(f"training done at step {result['step']}; best val {result['best_val']:.4f}")
    if cfg.get("test"):
        # Reference train.yaml `test: true` runs trainer.test on the best
        # checkpoint, whose test_step is NotImplemented
        # (diffusion_module.py:201-208) — mirror the surface, warn instead
        # of crashing.
        log.warning("test=true: the reference's test_step is NotImplemented "
                    "(diffusion_module.py:201-208); skipping the test stage")
    return result


if __name__ == "__main__":
    main()
