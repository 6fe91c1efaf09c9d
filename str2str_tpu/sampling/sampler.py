"""Forward-perturb / reverse-anneal sampling engine.

Re-design of the reference `predict_step` (diffusion_module.py:214-369) for
TPU execution:

  * the whole anneal is ONE jit-compiled function: forward perturbation,
    self-conditioning init, a `lax.scan` over reverse steps, and the final
    prediction pass — no per-step Python, no host round-trips;
  * replicas are batched along the leading axis; each batch row carries its
    own (t, dt, active) schedule, so replicas of *different* delta values can
    anneal in the same batch (the reference loops delta values serially);
  * randomness is explicit: one PRNG key in, folded per step.

NFE parity: for a given delta the schedule is `linspace(min_t, delta,
int(num_timesteps*delta))` reversed, with a reverse step on all but the last
time and a final x0 prediction at min_t — exactly the reference protocol.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.se3 import FrameState, SE3Diffusion
from ..geometry.frames import compute_backbone
from ..geometry.rigid import Rigid
from ..utils.logging import get_logger

_log = get_logger(__name__)


@dataclass(frozen=True)
class SamplerConfig:
    delta_min: float = 0.25
    delta_max: float = 0.70
    delta_step: float = 0.05
    n_replica: int = 100
    replica_per_batch: int = 50
    num_timesteps: int = 1000
    noise_scale: float = 1.0
    probability_flow: bool = True
    self_conditioning: bool = True
    min_t: float = 1e-2
    backward_only: bool = False
    # Upper bound on scan steps per device dispatch for the chained
    # sampler (0 = unlimited). The full reference protocol is a ~9.5k-step
    # chain; executing it as ONE device program means a single multi-minute
    # dispatch, which this environment's TPU worker kills ("TPU worker
    # process crashed") — and on any deployment it defeats preemption
    # checkpointing. Long chains run as ceil(T/max) back-to-back dispatches
    # with a device-resident donated carry: identical trajectories (noise
    # keys depend only on (slot, local step)), ~50 ms dispatch overhead per
    # boundary, at most 2 distinct compiled programs (chunk + remainder).
    max_steps_per_dispatch: int = 1000
    # TPU-first adaptive device batch: replica_per_batch is the reference's
    # per-GPU memory knob (diffusion_module.py:341), tuned for its largest
    # length — at small length buckets it leaves the chip mostly idle and
    # pays the per-step fixed cost (diffuser math latency, scan overhead)
    # over too few rows. When auto_batch_ref_len=R is set, the chained
    # samplers may raise the device batch up to the memory-equivalent
    # replica_per_batch*(R/L_pad)^2 (edge tensors are O(B*L^2)), clamped to
    # auto_batch_max rows. Statistically a no-op: replica chains are
    # independent, only their grouping into device dispatches changes.
    # 0 disables (exact replica_per_batch grouping, as tests pin).
    auto_batch_ref_len: int = 0
    auto_batch_max: int = 400

    def device_batch_cap(self, length: int) -> int:
        """Max rows per device batch for a length-`length` bucket."""
        if self.auto_batch_ref_len <= 0 or length <= 0:
            return self.replica_per_batch
        scale = max(1.0, (self.auto_batch_ref_len / length) ** 2)
        cap = min(int(self.replica_per_batch * scale), self.auto_batch_max)
        if cap > 8:
            cap = (cap // 8) * 8  # keep the sublane axis tile-aligned
        return max(self.replica_per_batch, cap)

    def delta_range(self) -> np.ndarray:
        return np.around(
            np.arange(self.delta_min, self.delta_max + 1e-5, self.delta_step),
            decimals=2)


def build_schedule(deltas: np.ndarray, num_timesteps: int, min_t: float):
    """Right-aligned per-sample schedules.

    Returns (ts [T, B], dt [B], active [T, B]) where T = max step count.
    Sample b is active in the last int(num_timesteps*delta_b) steps; inactive
    prefix steps hold t=delta_b and do not advance the state."""
    counts = [max(int(num_timesteps * float(d)), 2) for d in deltas]
    T = max(counts)
    B = len(deltas)
    ts = np.zeros((T, B), dtype=np.float32)
    active = np.zeros((T, B), dtype=np.float32)
    dt = np.zeros((B,), dtype=np.float32)
    for b, (d, c) in enumerate(zip(deltas, counts)):
        sched = np.linspace(min_t, float(d), c)[::-1]
        ts[:T - c, b] = float(d)
        ts[T - c:, b] = sched
        active[T - c:, b] = 1.0
        dt[b] = 1.0 / c
    return jnp.asarray(ts), jnp.asarray(dt), jnp.asarray(active)


def build_chained_schedule(deltas: np.ndarray, repeats: int,
                           num_timesteps: int, min_t: float):
    """Aligned-segment chained schedule: one batch ROW anneals every delta
    `repeats` times back-to-back, re-perturbing from the input structure at
    each segment start. Every row runs the IDENTICAL chain, so segment
    boundaries (and the output-slot index) are per-STEP scalars and the
    whole delta grid compiles to ONE program (the per-delta path compiles
    one program per distinct step count — ~10 for the reference grid, each
    paying its own first-dispatch cost).

    Per segment with step count c = max(int(num_timesteps*delta), 2) the
    chain contributes c+1 net calls — identical NFE to the per-delta path
    (reference protocol, diffusion_module.py:214-369: self-conditioning
    init at t=delta, c-1 reverse steps, final x0 prediction at min_t).

    Returns (sched, n_slots) where sched is a dict of (T,) arrays:
    ts, dt, init, final, slot, local. Noise keys downstream depend only on
    (slot, local), never on the global step index, so each segment's
    trajectory is independent of everything annealed before it.
    """
    ts, dts, init, final, slot, local = [], [], [], [], [], []
    s = 0
    for _ in range(repeats):
        for d in deltas:
            c = max(int(num_timesteps * float(d)), 2)
            sched = np.linspace(min_t, float(d), c)[::-1]
            ts += [float(d)] + [float(x) for x in sched[:-1]] + [float(min_t)]
            dts += [1.0 / c] * (c + 1)
            init += [1] + [0] * c
            final += [0] * c + [1]
            slot += [s] * (c + 1)
            local += list(range(c + 1))
            s += 1
    pack = {
        "ts": np.asarray(ts, np.float32),
        "dt": np.asarray(dts, np.float32),
        "init": np.asarray(init, np.float32),
        "final": np.asarray(final, np.float32),
        "slot": np.asarray(slot, np.int32),
        "local": np.asarray(local, np.int32),
    }
    return pack, s


class Sampler:
    """Binds a ScoreNetwork apply-fn and an SE3Diffusion into jitted
    forward-backward sampling kernels."""

    def __init__(self, net, diffuser: SE3Diffusion, cfg: SamplerConfig = SamplerConfig(),
                 mesh=None, seq_mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — replica
        batches shard across it (each chip anneals its slice; no collectives
        on the hot path).

        seq_mesh: optional Mesh whose axis matches `net.cfg.seq_axis` — the
        long-context mode: the WHOLE anneal runs inside shard_map with the
        edge tensors column-sharded over the axis (O(L^2)/n_devices memory
        per chip) and everything node-sized replicated
        (parallel/seq_shard.py). Mutually exclusive with `mesh`."""
        self.net = net
        self.diffuser = diffuser
        self.cfg = cfg
        self.mesh = mesh
        self.seq_mesh = seq_mesh
        if seq_mesh is not None:
            assert mesh is None, "seq_mesh and mesh are mutually exclusive"
            assert getattr(net.cfg, "seq_axis", ""), \
                "seq_mesh requires net.cfg.seq_axis"

    # ------------------------------------------------------------------
    def _net_out_state(self, out) -> FrameState:
        return FrameState(out["quat"], out["trans"])

    @partial(jax.jit, static_argnums=(0,))
    def run(self, params, key: jax.Array, feats: Dict[str, jnp.ndarray],
            ts: jnp.ndarray, dt: jnp.ndarray, active: jnp.ndarray):
        """Anneal one batch.

        feats: featurized batch (B, L, ...) with rigidgroups_gt_frames.
        ts/dt/active: schedules from `build_schedule` (T, B)/(B,)/(T, B).
        Returns dict with atom37 (B, L, 37, 3) and rigids (B, L, 7).
        """
        if self.seq_mesh is not None:
            from str2str_tpu.parallel.compat import shard_map
            from jax.sharding import PartitionSpec as P
            # All inputs/outputs replicated; the sharding is internal (each
            # device holds its column shard of the edge tensors and the
            # attention psums keep node-level state bitwise replicated).
            fn = shard_map(
                self._run_impl, mesh=self.seq_mesh,
                in_specs=(P(), P(), P(), P(), P(), P()),
                out_specs=P(), check_rep=False)
            return fn(params, key, feats, ts, dt, active)
        return self._run_impl(params, key, feats, ts, dt, active)

    def _make_net_apply(self, params, feats, residue_mask, fixed_mask):
        """Score-network closure shared by the per-delta and chained
        anneal impls (a drifted copy would silently diverge the two
        samplers)."""
        net_feats = {
            "residue_idx": feats["residue_idx"],
            "residue_mask": residue_mask,
            "fixed_mask": fixed_mask,
            "aatype": feats["aatype"],
            "torsion_angles_sin_cos": feats["torsion_angles_sin_cos"],
        }

        def net_apply(state: FrameState, sc_ca, t):
            batch = dict(net_feats)
            batch["rigids_t"] = state.to_tensor_7()
            batch["sc_ca_t"] = sc_ca
            batch["t"] = t
            return self.net.apply(params, batch, deterministic=True)

        return net_apply

    def _run_impl(self, params, key, feats, ts, dt, active):
        cfg = self.cfg
        k_fwd, k_anneal = jax.random.split(key)

        residue_mask = feats["residue_mask"].astype(jnp.float32)
        fixed_mask = feats["fixed_mask"].astype(jnp.float32)
        diffuse_mask = (1.0 - fixed_mask) * residue_mask

        gt_rigids = Rigid.from_tensor_4x4(
            feats["rigidgroups_gt_frames"][..., 0, :, :].astype(jnp.float32))
        state_0 = FrameState.from_rigid(gt_rigids)

        t_start = ts[0]  # (B,) = delta per sample
        if cfg.backward_only:
            state = self.diffuser.sample_prior(
                k_fwd, state_0.quat.shape[:-1], reference=state_0,
                diffuse_mask=residue_mask)
        else:
            state = self.diffuser.forward_marginal(
                k_fwd, state_0, t_start, diffuse_mask=residue_mask)["state_t"]

        net_apply = self._make_net_apply(params, feats, residue_mask,
                                         fixed_mask)

        sc_ca = jnp.zeros_like(state.trans)
        if cfg.self_conditioning:
            sc_ca = net_apply(state, sc_ca, t_start)["trans"]

        T = ts.shape[0]

        def step(carry, inp):
            state, sc_ca = carry
            i, t_i, act_i = inp
            out = net_apply(state, sc_ca, t_i)
            if cfg.self_conditioning:
                new_sc = out["trans"]
                sc_ca_next = jnp.where(act_i[:, None, None] > 0, new_sc, sc_ca)
            else:
                sc_ca_next = sc_ca

            pred_state = self._net_out_state(out)
            scores = self.diffuser.score(pred_state, state, t_i, mask=residue_mask)
            k_i = jax.random.fold_in(k_anneal, i)
            next_state = self.diffuser.reverse(
                k_i, state, scores["rot_score"], scores["trans_score"],
                t_i, dt, diffuse_mask=diffuse_mask, center_trans=True,
                center_mask=residue_mask, noise_scale=cfg.noise_scale,
                probability_flow=cfg.probability_flow)

            keep = act_i[:, None, None] > 0
            state = FrameState(
                jnp.where(keep, next_state.quat, state.quat),
                jnp.where(keep, next_state.trans, state.trans))
            return (state, sc_ca_next), None

        # Reverse steps on all but the final time point.
        idx = jnp.arange(T - 1)
        (state, sc_ca), _ = jax.lax.scan(
            step, (state, sc_ca), (idx, ts[:-1], active[:-1]))

        # Final prediction pass at t = min_t.
        out = net_apply(state, sc_ca, ts[-1])
        final_state = self._net_out_state(out)

        atom37, atom37_mask, atom14 = compute_backbone(
            final_state.to_rigid(), out["psi"], feats["aatype"])
        return {
            "atom37": atom37,
            "atom37_mask": atom37_mask,
            "rigids": final_state.to_tensor_7(),
            "psi": out["psi"],
        }

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 4))
    def run_chained(self, params, key: jax.Array, feats: Dict[str, jnp.ndarray],
                    n_slots: int, ts, dts, init_f, final_f, slot, local):
        """Anneal the full delta grid in ONE program.

        Schedule arrays are (T,) per-step scalars from
        `build_chained_schedule`; every batch row runs the same chain with
        its own noise. Each scan step performs exactly one net call; per-step
        flags select its role (segment re-init + self-conditioning init /
        reverse step / final x0 prediction). The step's x0 prediction is
        written unconditionally into the current segment's output slot — the
        last write to a slot is that segment's final step, so no predication
        is needed.

        Returns dict with atom37 (n_slots, B, L, 37, 3), rigids
        (n_slots, B, L, 7), psi (n_slots, B, L, 2) and atom37_mask (B, L, 37).
        """
        if self.seq_mesh is not None:
            from str2str_tpu.parallel.compat import shard_map
            from jax.sharding import PartitionSpec as P
            fn = shard_map(
                partial(self._run_chained_impl, n_slots), mesh=self.seq_mesh,
                in_specs=(P(),) * 9, out_specs=P(), check_rep=False)
            return fn(params, key, feats, ts, dts, init_f, final_f, slot, local)
        return self._run_chained_impl(n_slots, params, key, feats,
                                      ts, dts, init_f, final_f, slot, local)

    def _chained_init_carry(self, n_slots, feats):
        """(state, sc_ca, rigid/psi slot buffers) — the cross-chunk scan
        carry. Chunked dispatches thread it device-to-device (donated); the
        one-shot path builds it inside the jit.

        The carry holds only the (S, B, L, 7) rigids and (S, B, L, 2) psi
        per slot — atom37 (37x3 floats/residue, ~40x the bytes) is rebuilt
        from them ONCE after the scan (`_chained_outputs`). Carrying the
        atom37 buffer instead costs a buffer-sized copy chain through every
        scan step's slot-write cond (measured ~2x per-step at L=64 B=50)."""
        residue_mask = feats["residue_mask"].astype(jnp.float32)
        B, L = residue_mask.shape
        gt_rigids = Rigid.from_tensor_4x4(
            feats["rigidgroups_gt_frames"][..., 0, :, :].astype(jnp.float32))
        state_0 = FrameState.from_rigid(gt_rigids)
        return (state_0, jnp.zeros_like(state_0.trans),
                jnp.zeros((n_slots, B, L, 7), jnp.float32),
                jnp.zeros((n_slots, B, L, 2), jnp.float32))

    def _run_chained_impl(self, n_slots, params, key, feats,
                          ts, dts, init_f, final_f, slot, local):
        carry = self._chained_init_carry(n_slots, feats)
        carry = self._chained_scan(params, key, feats, carry,
                                   ts, dts, init_f, final_f, slot, local)
        return self._chained_outputs(feats, carry)

    def _chained_scan(self, params, key, feats, carry,
                      ts, dts, init_f, final_f, slot, local):
        """Scan a (slice of the) chained schedule; carry in, carry out.

        Noise keys are a function of (slot, local step) ONLY — never the
        global step index — so slicing the schedule across dispatches at any
        boundary reproduces the one-shot trajectories bitwise."""
        cfg = self.cfg
        k_fwd, k_anneal = jax.random.split(key)

        residue_mask = feats["residue_mask"].astype(jnp.float32)
        fixed_mask = feats["fixed_mask"].astype(jnp.float32)
        diffuse_mask = (1.0 - fixed_mask) * residue_mask

        gt_rigids = Rigid.from_tensor_4x4(
            feats["rigidgroups_gt_frames"][..., 0, :, :].astype(jnp.float32))
        state_0 = FrameState.from_rigid(gt_rigids)
        B, L = residue_mask.shape

        net_apply = self._make_net_apply(params, feats, residue_mask,
                                         fixed_mask)

        # Segment keys: a function of (slot, local step) ONLY, so a
        # segment's trajectory cannot depend on its position in the chain.
        # Precomputed VECTORIZED before the scan (one batched threefry pass,
        # bitwise-identical to per-step fold_in chains) instead of three
        # sequential hashes on the scan's critical path.
        k_seg_all = jax.vmap(lambda s: jax.random.fold_in(k_fwd, s))(slot)
        k_rev_all = jax.vmap(lambda s, l: jax.random.fold_in(
            jax.random.fold_in(k_anneal, s), l))(slot, local)

        def step(carry, inp):
            state, sc_ca, br, bpsi = carry
            t_i, dt_i, ini, fin, s_i, loc, k_seg, k_rev = inp
            tb = jnp.full((B,), t_i, jnp.float32)

            # Segment re-init happens on ~0.2% of steps; lax.cond keeps the
            # IGSO(3) inverse-CDF sampling off the other 99.8%.
            def _seg_init(ops):
                st, sc = ops
                if cfg.backward_only:
                    st_new = self.diffuser.sample_prior(
                        k_seg, st.quat.shape[:-1], reference=state_0,
                        diffuse_mask=residue_mask)
                else:
                    st_new = self.diffuser.forward_marginal(
                        k_seg, state_0, tb, diffuse_mask=residue_mask)["state_t"]
                return st_new, jnp.zeros_like(sc)

            state, sc_in = jax.lax.cond(
                ini > 0, _seg_init, lambda ops: ops, (state, sc_ca))

            out = net_apply(state, sc_in, tb)
            sc_next = out["trans"] if cfg.self_conditioning else sc_in

            pred_state = self._net_out_state(out)
            scores = self.diffuser.score(pred_state, state, tb,
                                         mask=residue_mask)
            next_state = self.diffuser.reverse(
                k_rev, state, scores["rot_score"], scores["trans_score"],
                tb, jnp.full((B,), dt_i, jnp.float32),
                diffuse_mask=diffuse_mask, center_trans=True,
                center_mask=residue_mask, noise_scale=cfg.noise_scale,
                probability_flow=cfg.probability_flow)
            adv = jnp.logical_and(ini <= 0, fin <= 0)
            state = FrameState(
                jnp.where(adv, next_state.quat, state.quat),
                jnp.where(adv, next_state.trans, state.trans))

            # Only a segment's FINAL x0 prediction is kept; lax.cond keeps
            # the slot writes off every non-final step (they were
            # last-write-wins before, same result). atom37 is NOT built or
            # carried here — `_chained_outputs` rebuilds it from the rigid +
            # psi slots once after the scan.
            def _write_slots(bufs):
                br_, bpsi_ = bufs
                br_ = jax.lax.dynamic_update_slice(
                    br_, pred_state.to_tensor_7()[None].astype(jnp.float32),
                    (s_i, 0, 0, 0))
                bpsi_ = jax.lax.dynamic_update_slice(
                    bpsi_, out["psi"][None].astype(jnp.float32),
                    (s_i, 0, 0, 0))
                return br_, bpsi_

            br, bpsi = jax.lax.cond(
                fin > 0, _write_slots, lambda bufs: bufs, (br, bpsi))
            return (state, sc_next, br, bpsi), None

        carry, _ = jax.lax.scan(
            step, carry,
            (ts, dts, init_f, final_f, slot, local, k_seg_all, k_rev_all))
        return carry

    @partial(jax.jit, static_argnums=(0,))
    def _chained_outputs(self, feats, carry):
        """Rebuild atom37 for every slot from the carried rigids/psi (one
        batched compute_backbone over S*B rows — identical values to the
        in-scan rebuild this replaces, without the 37x3-float slot buffer
        riding through every scan step)."""
        _, _, bufr, bufpsi = carry
        residue_mask = feats["residue_mask"]
        B, L = residue_mask.shape
        S = bufr.shape[0]
        state = FrameState(bufr[..., :4].reshape(S * B, L, 4),
                           bufr[..., 4:].reshape(S * B, L, 3))
        aatype = jnp.broadcast_to(feats["aatype"][None], (S,) + feats["aatype"].shape)
        atom37, atom37_mask, _ = compute_backbone(
            state.to_rigid(), bufpsi.reshape(S * B, L, 2),
            aatype.reshape(S * B, L))
        return {"atom37": atom37.reshape(S, B, L, 37, 3),
                "rigids": bufr, "psi": bufpsi,
                "atom37_mask": atom37_mask[:B]}

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(4,))
    def run_chained_chunk(self, params, key, feats, carry,
                          ts, dts, init_f, final_f, slot, local):
        """One bounded dispatch of the chained anneal (see
        SamplerConfig.max_steps_per_dispatch). The carry is donated, so the
        slot buffers update in place across dispatches."""
        if self.seq_mesh is not None:
            from str2str_tpu.parallel.compat import shard_map
            from jax.sharding import PartitionSpec as P
            fn = shard_map(
                self._chained_scan, mesh=self.seq_mesh,
                in_specs=(P(),) * 10, out_specs=P(), check_rep=False)
            return fn(params, key, feats, carry,
                      ts, dts, init_f, final_f, slot, local)
        return self._chained_scan(params, key, feats, carry,
                                  ts, dts, init_f, final_f, slot, local)

    def _run_chained_auto(self, params, key, feats, n_slots, sched):
        """Dispatch a full chained schedule, bounded per-dispatch.

        sched: host-side numpy dict from build_chained_schedule. Splits into
        <= max_steps_per_dispatch slices (at most 2 distinct scan lengths →
        at most 2 compiled programs) when a bound is set; one-shot
        `run_chained` otherwise."""
        keys = ("ts", "dt", "init", "final", "slot", "local")
        T = sched["ts"].shape[0]
        C = int(self.cfg.max_steps_per_dispatch)
        if C <= 0 or T <= C:
            return self.run_chained(
                params, key, feats, n_slots,
                *(jnp.asarray(sched[k]) for k in keys))
        carry = self._chained_init_carry(n_slots, feats)
        for lo in range(0, T, C):
            carry = self.run_chained_chunk(
                params, key, feats, carry,
                *(jnp.asarray(sched[k][lo:lo + C]) for k in keys))
        return self._chained_outputs(feats, carry)

    def sample_ensemble_chained(self, params, key: jax.Array,
                                feats_single: Dict[str, np.ndarray],
                                deltas: Optional[np.ndarray] = None,
                                n_replica: Optional[int] = None
                                ) -> Dict[float, np.ndarray]:
        """`sample_ensemble` semantics via ONE compiled program.

        Replicas are padded up to a multiple of the batch size (extra
        conformations are discarded), each row annealing the whole delta
        grid `ceil(n_replica/B)` times. Compile count: 1 (vs one per
        distinct step count for `sample_ensemble`)."""
        cfg = self.cfg
        deltas = cfg.delta_range() if deltas is None else np.asarray(deltas)
        n_replica = n_replica or cfg.n_replica
        if cfg.backward_only:
            n_replica = n_replica * len(deltas)
            deltas = np.asarray([1.0])
        L_pad = feats_single["aatype"].shape[0]
        B = min(cfg.device_batch_cap(L_pad), n_replica)
        repeats = -(-n_replica // B)

        sched, n_slots = build_chained_schedule(
            deltas, repeats, cfg.num_timesteps, cfg.min_t)
        batch = {k: jnp.asarray(np.broadcast_to(v, (B,) + v.shape))
                 for k, v in feats_single.items()
                 if isinstance(v, np.ndarray)}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            bsh = NamedSharding(self.mesh, P("data"))
            batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

        import time as _time
        _t0 = _time.perf_counter()
        out = self._run_chained_auto(params, key, batch, n_slots, sched)
        atom37 = np.asarray(out["atom37"])          # (S, B, L, 37, 3)
        _log.debug("chained run: S=%d B=%d T=%d: %.2fs",
                   n_slots, B, sched["ts"].shape[0],
                   _time.perf_counter() - _t0)

        D = len(deltas)
        results: Dict[float, np.ndarray] = {}
        for di, d in enumerate(deltas):
            arr = np.concatenate(
                [atom37[r * D + di] for r in range(repeats)], axis=0)
            results[round(float(d), 4)] = arr[:n_replica]
        return results

    # ------------------------------------------------------------------
    def sample_ensemble_multi(self, params, key: jax.Array,
                              feats_list,
                              deltas: Optional[np.ndarray] = None,
                              n_replica: Optional[int] = None):
        """Batched MULTI-TARGET sampling: pack replicas of several
        same-bucket targets into shared device batches.

        The reference samples one protein at a time (`predict_step` asserts
        batch_size==1, diffusion_module.py:249) and loops replicas in Python
        chunks; here the batch axis is a global pool of row-chains — each
        row belongs to one target and anneals the full delta grid
        `repeats` times (chained schedule, identical per-target NFE to
        `sample_ensemble_chained`). Rows from different targets share
        batches, so a 13-target eval is one compiled program with the batch
        (and any `data` mesh axis) always full; the final partial chunk is
        padded by cycling rows from the start and padded outputs discarded.

        feats_list: featurized targets, all padded to the SAME bucket.
        Returns a list of {delta: atom37 (n_replica, L, 37, 3)}, one per
        target, in input order.
        """
        cfg = self.cfg
        deltas = cfg.delta_range() if deltas is None else np.asarray(deltas)
        n_replica = n_replica or cfg.n_replica
        if cfg.backward_only:
            n_replica = n_replica * len(deltas)
            deltas = np.asarray([1.0])
        K = len(feats_list)
        L = feats_list[0]["aatype"].shape[0]
        for f in feats_list[1:]:
            if f["aatype"].shape[0] != L:
                raise ValueError("all targets must share one length bucket")

        cap = cfg.device_batch_cap(L)
        # Same chain depth a single-target run would use, so per-target NFE
        # and segment count match sample_ensemble_chained exactly.
        repeats = -(-n_replica // min(cap, n_replica))
        rows_per_target = -(-n_replica // repeats)
        row_targets = np.repeat(np.arange(K), rows_per_target)
        n_rows = len(row_targets)
        B = min(cap, n_rows)
        if cap > cfg.replica_per_batch:
            # Free to choose any batch size up to the cap: pick the one
            # that minimizes padded (discarded) rows, tie-broken toward
            # fewer dispatches. Candidates stay multiples of 8 (sublane
            # tile) plus n_rows itself for the single-chunk case.
            cands = [b for b in range(8, cap + 1, 8)]
            if n_rows <= cap:
                cands.append(n_rows)
            B = min(cands,
                    key=lambda b: (-(-n_rows // b) * b - n_rows,
                                   -(-n_rows // b), -b))
        pad = (-n_rows) % B
        if pad:  # cycle rows so padded chains still anneal real targets
            row_targets = np.concatenate([row_targets, row_targets[:pad]])
            # No silent caps: each padded row is a full-length anneal chain
            # whose output is discarded — surface the waste so a small-K /
            # large-replica_per_batch run can be re-shaped deliberately.
            _log.info(
                "multi-target packing: final chunk padded with %d cycled "
                "row(s) (%.0f%% of device time in that chunk is discarded); "
                "K=%d targets x %d rows/target, B=%d",
                pad, 100.0 * pad / B, K, rows_per_target, B)

        sched, n_slots = build_chained_schedule(
            deltas, repeats, cfg.num_timesteps, cfg.min_t)
        bsh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            bsh = NamedSharding(self.mesh, P("data"))

        D = len(deltas)
        per_target = [[[] for _ in range(D)] for _ in range(K)]
        import time as _time
        for ci, lo in enumerate(range(0, len(row_targets), B)):
            chunk = row_targets[lo:lo + B]
            batch = {k: jnp.asarray(np.stack([feats_list[t][k] for t in chunk]))
                     for k, v in feats_list[0].items()
                     if isinstance(v, np.ndarray)}
            if bsh is not None:
                batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
            _t0 = _time.perf_counter()
            out = self._run_chained_auto(params, jax.random.fold_in(key, ci),
                                         batch, n_slots, sched)
            atom37 = np.asarray(out["atom37"])  # (S, B, L, 37, 3)
            _log.debug("multi chunk %d: %d targets x rows, B=%d T=%d: %.2fs",
                       ci, len(np.unique(chunk)), B, sched["ts"].shape[0],
                       _time.perf_counter() - _t0)
            live = len(chunk) if lo + B <= n_rows else n_rows - lo
            for j in range(live):
                t = int(chunk[j])
                for di in range(D):
                    for r in range(repeats):
                        per_target[t][di].append(atom37[r * D + di, j])

        results = []
        for t in range(K):
            results.append({
                round(float(d), 4): np.stack(per_target[t][di])[:n_replica]
                for di, d in enumerate(deltas)})
        return results

    # ------------------------------------------------------------------
    def sample_ensemble(self, params, key: jax.Array,
                        feats_single: Dict[str, np.ndarray],
                        deltas: Optional[np.ndarray] = None,
                        n_replica: Optional[int] = None,
                        batch_deltas_together: bool = False) -> Dict[float, np.ndarray]:
        """Sample `n_replica` conformations per delta for ONE protein.

        feats_single: featurized (unbatched) protein, already padded.
        Returns {delta: atom37 (n_replica, L, 37, 3)} (host numpy).

        With batch_deltas_together=True, replicas of every delta share
        batches (one compilation; inactive prefix steps are masked). The
        default groups per delta (exact reference NFE; one compilation per
        distinct step count)."""
        cfg = self.cfg
        deltas = cfg.delta_range() if deltas is None else np.asarray(deltas)
        n_replica = n_replica or cfg.n_replica
        if cfg.backward_only:
            n_replica = n_replica * len(deltas)
            deltas = np.asarray([1.0])

        jobs = []  # (delta, count) batches
        if batch_deltas_together:
            all_deltas = np.repeat(deltas, n_replica)
            for lo in range(0, len(all_deltas), cfg.replica_per_batch):
                jobs.append(all_deltas[lo:lo + cfg.replica_per_batch])
        else:
            for d in deltas:
                left = n_replica
                while left > 0:
                    take = min(cfg.replica_per_batch, left)
                    jobs.append(np.full((take,), d, dtype=np.float32))
                    left -= take

        results: Dict[float, list] = {round(float(d), 4): [] for d in deltas}
        # The broadcast feature batch is identical for every job (only the
        # ts/dt/active schedules differ): build and place it ONCE instead
        # of re-materializing + re-transferring it per job (20 jobs at the
        # reference protocol).
        B = cfg.replica_per_batch  # pad every batch to a static size
        batch = {k: jnp.asarray(np.broadcast_to(v, (B,) + v.shape))
                 for k, v in feats_single.items()
                 if isinstance(v, np.ndarray)}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            bsh = NamedSharding(self.mesh, P("data"))
            batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        for j, job_deltas in enumerate(jobs):
            pad = B - len(job_deltas)
            sched_deltas = np.concatenate(
                [job_deltas, np.full((pad,), job_deltas[-1], np.float32)])
            ts, dt, active = build_schedule(
                sched_deltas, cfg.num_timesteps, cfg.min_t)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                ts = jax.device_put(ts, NamedSharding(self.mesh, P(None, "data")))
                active = jax.device_put(active, NamedSharding(self.mesh, P(None, "data")))
                dt = jax.device_put(dt, NamedSharding(self.mesh, P("data")))
            import time as _time
            _t0 = _time.perf_counter()
            out = self.run(params, jax.random.fold_in(key, j), batch, ts, dt, active)
            atom37 = np.asarray(out["atom37"])[:len(job_deltas)]
            _log.debug(
                "job %d delta=%.2f T=%d B=%d: %.2fs (dispatch+anneal+fetch)",
                j, float(job_deltas[0]), ts.shape[0], B,
                _time.perf_counter() - _t0)
            for d in np.unique(job_deltas):
                results[round(float(d), 4)].append(atom37[job_deltas == d])
        return {d: np.concatenate(v, axis=0) for d, v in results.items()}
