"""Training loop: jitted SPMD train step, optimizer, plateau LR schedule,
checkpointing, CSV logging.

Replaces the reference's Lightning stack (DiffusionLitModule.model_step /
training_step, diffusion_module.py:104-199; Trainer + DDP configs) with a
pure-functional jax loop:

  * `train_step` is one jit-compiled function — time sampling, SE(3) forward
    perturbation, stochastic self-conditioning (lax.cond), network forward,
    rescoring, loss, grads, optimizer update;
  * data parallelism: batch sharded over a 1-D device mesh, params
    replicated; XLA emits the gradient all-reduce (replaces DDP/NCCL);
  * ReduceLROnPlateau on the epoch-mean validation loss via
    optax.inject_hyperparams (replaces torch.optim.lr_scheduler);
  * orbax checkpoints with resume; per-epoch CSV metrics log.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.se3 import FrameState, SE3Diffusion
from ..geometry.rigid import Rigid
from ..parallel import mesh as mesh_lib
from ..utils import checkpoints as ckpt_lib
from .losses import LossConfig, score_matching_loss


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: Optional[float] = None
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    min_lr: float = 1e-8
    # Lightning min_epochs: EarlyStopping may not fire before this many
    # epochs have run (reference configs/trainer/default.yaml:6).
    min_epochs: int = 1
    max_epochs: int = 500
    max_steps: int = -1
    # Wall-clock budget "DD:HH:MM:SS" (Lightning trainer.max_time,
    # reference README.md:107); training stops gracefully (checkpoint +
    # logger finalize) after the budget elapses. Empty disables.
    max_time: str = ""
    seed: int = 0
    num_devices: int = -1
    log_every_n_steps: int = 50
    val_every_n_epochs: int = 1
    ckpt_every_n_epochs: int = 1
    keep_ckpts: int = 3
    # Accumulate gradients over N micro-batches before each optimizer update
    # (reference trainer.accumulate_grad_batches semantics).
    gradient_accumulation: int = 1
    # Stop when val/loss has not improved for N validation epochs
    # (reference EarlyStopping, configs/callbacks/default.yaml:16-26);
    # <= 0 disables.
    early_stopping_patience: int = -1
    # Keep a `best/` checkpoint tracking the lowest val/loss (reference
    # ModelCheckpoint monitor=val/loss, configs/callbacks/default.yaml:8-15).
    save_best: bool = True
    # Train through the fused Pallas kernels. Round 3: every kernel has a
    # hand-written Pallas BACKWARD (recompute-in-VMEM, no oracle re-run),
    # measured 1.97x FASTER per train step than the plain XLA path at
    # B=8 L=256 bf16 (40.7 vs 80.0 ms/step, scripts/bench_train_step.py),
    # so fused training is now the default. Set false to force the XLA
    # paths (e.g. when isolating a kernel suspicion).
    use_fused_kernels: bool = True
    # Train steps executed per host dispatch: same-shape batches are
    # stacked and scanned on-device (lax.scan), amortizing the per-call
    # pytree marshalling / dispatch latency. 1 = classic per-step loop.
    steps_per_call: int = 1
    # Per-epoch batch caps (reference trainer.limit_train_batches /
    # limit_val_batches, configs/debug/limit.yaml): a float < 1.0 is a
    # fraction of the loader's estimated batch count, an int >= 1 an
    # absolute count, 1.0/0 disables.
    limit_train_batches: float = 1.0
    limit_val_batches: float = 1.0
    # Train (and validate) on just the first N train batches, repeatedly
    # (reference trainer.overfit_batches, configs/debug/overfit.yaml).
    overfit_batches: int = 0
    # Sequence-shard axis size for 2-D (data, seq) mesh TRAINING: >1 runs
    # the score network inside shard_map with its O(L^2) edge tensors
    # column-sharded over `seq_devices` devices per data shard
    # (parallel/seq_shard.py) — training memory O(L^2)/seq_devices, so
    # chains far beyond the reference's 500-residue cap
    # (configs/data/protein.yaml:10-11) fit. Bucket lengths must divide by
    # seq_devices; the device count must divide by it too.
    seq_devices: int = 1
    detect_anomaly: bool = False
    profile_dir: str = ""
    self_conditioning_prob: float = 0.5


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.grad_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    chain.append(opt)
    tx = optax.chain(*chain)
    if cfg.gradient_accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place (plateau schedule)."""
    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            node.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        return node
    return jax.tree.map(visit, opt_state,
                        is_leaf=lambda n: hasattr(n, "hyperparams"))


def get_learning_rate(opt_state) -> float:
    lrs = []

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            lrs.append(float(node.hyperparams["learning_rate"]))
        return node
    jax.tree.map(visit, opt_state, is_leaf=lambda n: hasattr(n, "hyperparams"))
    return lrs[0] if lrs else float("nan")


class Trainer:
    def __init__(self, net, diffuser: SE3Diffusion, loss_cfg: LossConfig,
                 cfg: TrainConfig = TrainConfig(), log_dir: str = "outputs/logs",
                 ckpt_dir: str = "outputs/ckpt", loggers=None):
        # The fused Pallas kernels are custom_vjps (XLA-oracle backward) and
        # CAN train, but the oracle-recompute backward makes that a net
        # slowdown (see TrainConfig.use_fused_kernels); default to XLA.
        from dataclasses import replace as _dc_replace
        from ..model.network import ScoreNetwork as _SN
        if not cfg.use_fused_kernels:
            if isinstance(net, _SN) and (net.cfg.use_pallas != "off"
                                         or net.cfg.use_pallas_ipa != "off"):
                net = _SN(_dc_replace(net.cfg, use_pallas="off",
                                      use_pallas_ipa="off"))
        # int8 EdgeTransition dots are inference-only (no VJP; a grad
        # through the quantization rounding would be silently zero).
        if isinstance(net, _SN) and net.cfg.edge_dots_int8:
            net = _SN(_dc_replace(net.cfg, edge_dots_int8=False))
        if cfg.seq_devices > 1:
            # 2-D (data, seq) mesh: auto-enable the network's
            # sequence-sharded mode (same trunk the long-context sampler
            # uses, parallel/seq_shard.py) and run it inside shard_map.
            from ..parallel.seq_shard import SEQ_AXIS
            if isinstance(net, _SN) and net.cfg.seq_axis != SEQ_AXIS:
                net = _SN(_dc_replace(net.cfg, seq_axis=SEQ_AXIS))
            self.mesh = mesh_lib.make_mesh_2d(cfg.seq_devices,
                                              cfg.num_devices)
        else:
            self.mesh = mesh_lib.make_mesh(cfg.num_devices)
        self.net = net
        self.diffuser = diffuser
        self.loss_cfg = loss_cfg
        self.cfg = cfg
        self.optimizer = make_optimizer(cfg)
        self.log_dir = Path(log_dir)
        self.ckpt_dir = Path(ckpt_dir)
        # Pluggable experiment loggers (reference configs/logger/* surface);
        # default preserves the CSV behavior.
        if loggers is None:
            from ..utils.metrics_logger import CSVLogger, MultiLogger
            loggers = MultiLogger([CSVLogger(str(self.log_dir))])
        self.loggers = loggers
        self._compiled = {}

    # ------------------------------------------------------------------
    def _net_apply(self, params, net_batch, deterministic: bool, drop_key):
        """One score-network forward. With `seq_devices > 1` the apply runs
        inside shard_map over the 2-D (data, seq) mesh: batch rows sharded
        over 'data', edge tensors column-sharded over 'seq' inside the net
        (node-level tensors replicated over 'seq', exactly the long-context
        sampler's layout). shard_map is differentiable, so the same seam
        serves the gradient path."""
        if self.cfg.seq_devices <= 1:
            rngs = None if drop_key is None else {"dropout": drop_key}
            return self.net.apply(params, net_batch,
                                  deterministic=deterministic, rngs=rngs)
        from str2str_tpu.parallel.compat import shard_map
        from jax.sharding import PartitionSpec as P
        if drop_key is None:  # unused under deterministic=True
            drop_key = jax.random.PRNGKey(0)

        def inner(p, nb_l, key):
            # Independent dropout per DATA shard; the key must stay common
            # across 'seq' members so the replicated node-path compute (and
            # its dropout masks) agree shard-to-shard.
            key = jax.random.fold_in(
                key, jax.lax.axis_index(mesh_lib.DATA_AXIS))
            return self.net.apply(p, nb_l, deterministic=deterministic,
                                  rngs={"dropout": key})

        return shard_map(
            inner, mesh=self.mesh,
            in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
            out_specs=P(mesh_lib.DATA_AXIS),
            check_rep=False)(params, net_batch, drop_key)

    def model_step(self, params, key, batch, deterministic: bool):
        """Time sampling + forward perturbation + net + rescoring + loss.
        (reference model_step, diffusion_module.py:104-151)."""
        cfg = self.cfg
        k_t, k_fwd, k_sc_coin, k_sc, k_drop = jax.random.split(key, 5)

        gt_rigids = Rigid.from_tensor_4x4(
            batch["rigidgroups_gt_frames"][..., 0, :, :].astype(jnp.float32))
        state_0 = FrameState.from_rigid(gt_rigids)
        B = state_0.trans.shape[0]

        min_t = self.diffuser.min_t
        t = jax.random.uniform(k_t, (B,), minval=min_t, maxval=1.0)

        perturb = self.diffuser.forward_marginal(k_fwd, state_0, t)
        state_t = perturb["state_t"]

        net_batch = {
            "rigids_t": state_t.to_tensor_7(),
            "t": t,
            "residue_idx": batch["residue_idx"],
            "residue_mask": batch["residue_mask"].astype(jnp.float32),
            "fixed_mask": batch["fixed_mask"].astype(jnp.float32),
            "sc_ca_t": jnp.zeros_like(state_t.trans),
            "torsion_angles_sin_cos": batch["torsion_angles_sin_cos"].astype(jnp.float32),
            "aatype": batch["aatype"],
        }

        # Stochastic self-conditioning: one coin per step (reference
        # diffusion_module.py:133), extra forward without gradients.
        if self.net.cfg.self_conditioning and cfg.self_conditioning_prob > 0:
            def sc_fn(nb):
                out = self._net_apply(params, nb, True, None)
                return jax.lax.stop_gradient(out["trans"])

            coin = jax.random.bernoulli(k_sc_coin, cfg.self_conditioning_prob)
            net_batch["sc_ca_t"] = jax.lax.cond(
                coin, sc_fn, lambda nb: jnp.zeros_like(state_t.trans), net_batch)

        out = self._net_apply(params, net_batch, deterministic, k_drop)

        pred_state = FrameState(out["quat"], out["trans"])
        pred_scores = self.diffuser.score(
            pred_state, state_t, t, mask=net_batch["residue_mask"])

        loss_batch = {
            "t": t,
            "seq_mask": batch["seq_mask"].astype(jnp.float32),
            "fixed_mask": net_batch["fixed_mask"],
            "rot_score": perturb["rot_score"],
            "trans_score": perturb["trans_score"],
            "rot_score_scaling": perturb["rot_score_scaling"],
            "trans_score_scaling": perturb["trans_score_scaling"],
            "gt_trans_0": state_0.trans,
            "torsion_angles_sin_cos": net_batch["torsion_angles_sin_cos"],
            "aatype": batch["aatype"],
            "rigidgroups_gt_frames": batch["rigidgroups_gt_frames"],
        }
        loss_out = dict(out)
        loss_out.update(pred_scores)
        return score_matching_loss(loss_out, loss_batch, self.loss_cfg)

    # ------------------------------------------------------------------
    def _train_step(self, params, opt_state, key, batch):
        def loss_fn(p):
            loss, bd = self.model_step(p, key, batch, deterministic=False)
            return loss, bd

        (loss, breakdown), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {**breakdown, "grad_norm": gnorm}
        return params, opt_state, metrics

    def _eval_step(self, params, key, batch):
        loss, breakdown = self.model_step(params, key, batch, deterministic=True)
        return breakdown

    def _train_steps_scan(self, params, opt_state, key, batches):
        """K train steps in ONE dispatch: lax.scan over stacked batches
        (leading axis K). Amortizes per-call host/dispatch latency — one
        params-pytree marshal per K steps instead of per step — and keeps
        the device busy back-to-back (the Lightning loop dispatches per
        step). Metrics come back stacked (K, ...)."""
        def body(carry, batch_k):
            params, opt_state, key = carry
            key, k_step = jax.random.split(key)
            params, opt_state, metrics = self._train_step(
                params, opt_state, k_step, batch_k)
            return (params, opt_state, key), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            body, (params, opt_state, key), batches)
        return params, opt_state, metrics

    def compile(self):
        self.train_step = jax.jit(self._train_step, donate_argnums=(0, 1))
        self.train_steps_scan = jax.jit(self._train_steps_scan,
                                        donate_argnums=(0, 1))
        self.eval_step = jax.jit(self._eval_step)

    # ------------------------------------------------------------------
    def _log_csv(self, row: Dict[str, Any]):
        if self._is_main():
            self.loggers.log_metrics(row)

    @staticmethod
    def _is_main() -> bool:
        """Host-side writes (checkpoints, CSV rows) happen on process 0
        only: state is replicated, and concurrent writes to a shared
        directory from every host race orbax's tmp-dir renames and
        interleave CSV rows (reference logs rank-zero-only)."""
        import jax as _jax
        try:
            return _jax.process_index() == 0
        except Exception:
            return True

    def _sched_template(self) -> Dict[str, Any]:
        return {"lr": np.float64(self.cfg.lr), "plateau_wait": np.int64(0),
                "best_val": np.float64(np.inf), "es_wait": np.int64(0)}

    def fit(self, params, train_loader, val_loader=None,
            resume_from: Optional[str] = None) -> Dict[str, Any]:
        cfg = self.cfg
        self.compile()
        opt_state = self.optimizer.init(params)
        start_epoch, step = 0, 0
        sched = self._sched_template()
        if resume_from:
            # Structure-preserving restore: orbax rebuilds params AND the
            # (namedtuple-nested) optax state against the live templates,
            # instead of a fragile leaf-order unflatten.
            template = {"params": params, "opt_state": opt_state,
                        "step": np.int64(0), "epoch": np.int64(0),
                        "sched": sched}
            restored = ckpt_lib.load_checkpoint(resume_from, target=template)
            params = restored["params"]
            opt_state = restored["opt_state"]
            step = int(restored.get("step", 0))
            start_epoch = int(restored.get("epoch", 0))
            sched = restored.get("sched", sched)
            # Re-apply the restored learning rate to the optimizer state so a
            # resumed run does not silently reset its plateau schedule.
            opt_state = set_learning_rate(opt_state, float(sched["lr"]))

        if cfg.detect_anomaly:
            jax.config.update("jax_debug_nans", True)

        deadline = None
        if cfg.max_time:
            parts = [float(x) for x in str(cfg.max_time).split(":")]
            while len(parts) < 4:
                parts.insert(0, 0.0)
            d, h, m, sec = parts[-4:]
            deadline = time.time() + ((d * 24 + h) * 60 + m) * 60 + sec

        def limit_count(loader, limit) -> Optional[int]:
            """Batches allowed per epoch under a limit_*_batches setting."""
            if limit is None:
                return None
            if isinstance(limit, int):  # absolute count (0 = disabled)
                return int(limit) if limit >= 1 else None
            frac = float(limit)         # fraction of the epoch (1.0 = all)
            if frac >= 1.0:
                return None
            try:
                est = -(-len(loader.indices) // loader.batch_size)
            except (AttributeError, TypeError):
                try:
                    est = len(loader)
                except TypeError:
                    return None
            return max(1, int(est * frac))

        overfit_set = None
        if cfg.overfit_batches > 0:
            import itertools
            overfit_set = list(itertools.islice(iter(train_loader),
                                                cfg.overfit_batches))
        lim_train = limit_count(train_loader, cfg.limit_train_batches)
        lim_val = (limit_count(val_loader, cfg.limit_val_batches)
                   if val_loader is not None else None)

        key = jax.random.PRNGKey(cfg.seed + start_epoch)
        best_val = float(sched["best_val"])
        plateau_wait = int(sched["plateau_wait"])
        es_wait = int(sched["es_wait"])
        lr = float(sched["lr"])
        stop_early = False
        history = []

        for epoch in range(start_epoch, cfg.max_epochs):
            t0 = time.time()
            train_metrics = []
            # With steps_per_call > 1, buffer same-shape batches and run K
            # steps per dispatch (one params marshal + back-to-back device
            # steps instead of one host round trip per step).
            K = max(1, cfg.steps_per_call)
            pending: Dict[tuple, list] = {}
            profiling = [False]

            def run_steps(host_batches):
                nonlocal params, opt_state, step, key
                key, k_step = jax.random.split(key)
                # step >= 2: with steps_per_call=K the counter only
                # visits multiples of K, so an equality test would
                # never fire for K >= 3 and the trace silently stayed
                # empty.
                if cfg.profile_dir and step >= 2 and not profiling[0]:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling[0] = True
                if len(host_batches) == 1:
                    sharded = mesh_lib.shard_batch(host_batches[0], self.mesh)
                    params, opt_state, metrics = self.train_step(
                        params, opt_state, k_step, sharded)
                    rows = [metrics]
                else:
                    stacked = {k: np.stack([b[k] for b in host_batches])
                               for k in host_batches[0]}
                    sharded = mesh_lib.shard_stacked_batch(stacked, self.mesh)
                    params, opt_state, metrics = self.train_steps_scan(
                        params, opt_state, k_step, sharded)
                    n = len(host_batches)
                    rows = [jax.tree.map(lambda x, i=i: x[i], metrics)
                            for i in range(n)]
                for m in rows:
                    step += 1
                    if step % cfg.log_every_n_steps == 0:
                        train_metrics.append(
                            {k: float(v) for k, v in m.items()})
                if cfg.profile_dir and profiling[0] and step >= 6:
                    jax.tree.map(lambda x: x.block_until_ready(), rows[-1])
                    jax.profiler.stop_trace()
                    profiling[0] = False

            n_batches = 0
            for batch in (overfit_set if overfit_set is not None
                          else train_loader):
                host = {k: v for k, v in batch.items()
                        if isinstance(v, np.ndarray)}
                if K == 1:
                    run_steps([host])
                else:
                    shape_key = tuple(sorted(
                        (k, v.shape) for k, v in host.items()))
                    pending.setdefault(shape_key, []).append(host)
                    if len(pending[shape_key]) == K:
                        run_steps(pending.pop(shape_key))
                n_batches += 1
                if lim_train is not None and n_batches >= lim_train:
                    break
                if 0 < cfg.max_steps <= step:
                    break
                if deadline is not None and time.time() >= deadline:
                    stop_early = True
                    break
            # Leftover partial groups run per-step (avoids compiling a scan
            # for every residual group size). Skipped entirely once the
            # wall-clock budget has fired: each leftover step is a fresh
            # dispatch (possibly a new single-step compile), which would
            # overshoot max_time by minutes.
            for group in pending.values():
                for b in group:
                    if stop_early or 0 < cfg.max_steps <= step:
                        break
                    if deadline is not None and time.time() >= deadline:
                        stop_early = True
                        break
                    run_steps([b])

            row = {"epoch": epoch, "step": step, "lr": lr,
                   "epoch_time_s": round(time.time() - t0, 2)}
            if train_metrics:
                for k in train_metrics[0]:
                    row[f"train/{k}"] = float(np.mean([m[k] for m in train_metrics]))

            val_source = (overfit_set if overfit_set is not None
                          else val_loader)
            if val_source is not None and (epoch + 1) % cfg.val_every_n_epochs == 0:
                val_losses = []
                n_val = 0
                for batch in val_source:
                    n_val += 1
                    if lim_val is not None and n_val > lim_val:
                        break
                    batch = mesh_lib.shard_batch(
                        {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
                        self.mesh)
                    key, k_step = jax.random.split(key)
                    bd = self.eval_step(params, k_step, batch)
                    val_losses.append(float(bd["loss"]))
                val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
                row["val/loss"] = val_loss

                improved = val_loss < best_val - 1e-12
                if improved:
                    best_val, plateau_wait, es_wait = val_loss, 0, 0
                    if cfg.save_best and self._is_main():
                        # Best-model checkpoint (reference ModelCheckpoint
                        # monitoring val/loss, callbacks/default.yaml:8-15).
                        ckpt_lib.save_checkpoint(
                            str(self.ckpt_dir / "best"),
                            {"params": params, "step": step,
                             "epoch": epoch + 1},
                            metadata={"val_loss": val_loss, "epoch": epoch})
                else:
                    # ReduceLROnPlateau on val loss.
                    plateau_wait += 1
                    es_wait += 1
                    if plateau_wait > cfg.plateau_patience:
                        lr = max(lr * cfg.plateau_factor, cfg.min_lr)
                        opt_state = set_learning_rate(opt_state, lr)
                        plateau_wait = 0
                    if (0 < cfg.early_stopping_patience <= es_wait
                            and epoch + 1 >= cfg.min_epochs):
                        stop_early = True

            self._log_csv(row)
            history.append(row)

            budget_hit = 0 < cfg.max_steps <= step
            if ((epoch + 1) % cfg.ckpt_every_n_epochs == 0 or stop_early
                    or budget_hit) and self._is_main():
                sched = {"lr": np.float64(lr),
                         "plateau_wait": np.int64(plateau_wait),
                         "best_val": np.float64(best_val),
                         "es_wait": np.int64(es_wait)}
                ckpt_lib.save_checkpoint(
                    str(self.ckpt_dir / f"step_{step}"),
                    {"params": params, "opt_state": opt_state,
                     "step": step, "epoch": epoch + 1, "sched": sched},
                    metadata={"val_loss": row.get("val/loss"), "epoch": epoch})
                ckpt_lib.prune_checkpoints(str(self.ckpt_dir), cfg.keep_ckpts)

            if deadline is not None and time.time() >= deadline:
                from ..utils.logging import get_logger
                get_logger(__name__).info(
                    "max_time %s reached — stopping", cfg.max_time)
                stop_early = True
            if stop_early or 0 < cfg.max_steps <= step:
                break

        return {"params": params, "opt_state": opt_state, "step": step,
                "history": history, "best_val": best_val,
                "stopped_early": stop_early}
