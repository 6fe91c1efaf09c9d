"""MSA / template featurization transforms (AF2/OpenFold library surface).

Capability parity with the DORMANT portion of the reference's
data_transforms.py (reference src/common/data_transforms.py:46-572 and
random_crop_to_size :1114) — Str2Str itself never calls these (its
ProteinFeatureTransform uses only the structure-side subset, reference
dataset.py:125-143), but they are part of the library surface an AF2-style
data pipeline expects.

Design differences from the reference (host data path, TPU-idiomatic):
  * numpy in / numpy out — these run in dataloader workers, never on device;
  * every stochastic transform takes an explicit `rng: np.random.Generator`
    instead of the torch global RNG (reproducible per-(seed, idx) like the
    rest of the data pipeline, data/dataset.py:138);
  * transforms are plain functions over a feature dict (the reference's
    `curry1` decorators exist only to suit its compose chain).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..geometry import chemical as ch

NUM_RES = "num residues placeholder"
NUM_MSA_SEQ = "msa placeholder"
NUM_EXTRA_SEQ = "extra msa placeholder"
NUM_TEMPLATES = "num templates placeholder"

MSA_FEATURE_NAMES = [
    "msa", "deletion_matrix", "msa_mask", "msa_row_mask", "bert_mask",
    "true_msa",
]

# HHblits orders amino acids alphabetically by one-letter code, then X, gap
# (reference residue_constants.py:664-692). Derived, not copied.
_restypes_with_x_and_gap: List[str] = ch.restypes + ["X", "-"]
MAP_HHBLITS_AATYPE_TO_OUR_AATYPE = tuple(
    _restypes_with_x_and_gap.index(c)
    for c in sorted(ch.restypes) + ["X", "-"])

GAP_IDX = 21
X_IDX = 20


def make_one_hot(x: np.ndarray, num_classes: int) -> np.ndarray:
    out = np.zeros(x.shape + (num_classes,), dtype=np.float32)
    np.put_along_axis(out, x[..., None].astype(np.int64), 1.0, axis=-1)
    return out


def cast_to_64bit_ints(protein: Dict) -> Dict:
    for k, v in protein.items():
        if isinstance(v, np.ndarray) and v.dtype == np.int32:
            protein[k] = v.astype(np.int64)
    return protein


def make_seq_mask(protein: Dict) -> Dict:
    protein["seq_mask"] = np.ones(protein["aatype"].shape, dtype=np.float32)
    return protein


def make_template_mask(protein: Dict) -> Dict:
    protein["template_mask"] = np.ones(
        protein["template_aatype"].shape[0], dtype=np.float32)
    return protein


def make_all_atom_aatype(protein: Dict) -> Dict:
    protein["all_atom_aatype"] = protein["aatype"]
    return protein


def fix_templates_aatype(protein: Dict) -> Dict:
    """One-hot template aatype -> indices, HHblits order -> our order
    (reference data_transforms.py:89-105)."""
    if protein["template_aatype"].shape[0] > 0:
        idx = np.argmax(protein["template_aatype"], axis=-1)
        new_order = np.asarray(MAP_HHBLITS_AATYPE_TO_OUR_AATYPE, np.int64)
        protein["template_aatype"] = new_order[idx]
    return protein


def correct_msa_restypes(protein: Dict) -> Dict:
    """Map MSA from HHblits alphabet to ours; permute any *profile* feature
    columns accordingly (reference data_transforms.py:108-129)."""
    new_order = np.asarray(MAP_HHBLITS_AATYPE_TO_OUR_AATYPE,
                           protein["msa"].dtype)
    protein["msa"] = new_order[protein["msa"].astype(np.int64)]

    perm = np.zeros((22, 22), dtype=np.float32)
    perm[np.arange(22), MAP_HHBLITS_AATYPE_TO_OUR_AATYPE] = 1.0
    for k, v in protein.items():
        if "profile" in k:
            d = v.shape[-1]
            assert d in (20, 21, 22), f"profile dim {d} for {k}"
            protein[k] = v @ perm[:d, :d]
    return protein


def squeeze_features(protein: Dict) -> Dict:
    """Remove singleton/repeated dims (reference data_transforms.py:132-160)."""
    protein["aatype"] = np.argmax(protein["aatype"], axis=-1)
    for k in ("domain_name", "msa", "num_alignments", "seq_length",
              "sequence", "superfamily", "deletion_matrix", "resolution",
              "between_segment_residues", "residue_index",
              "template_all_atom_mask"):
        if k in protein:
            v = protein[k]
            if getattr(v, "ndim", 0) and v.shape[-1] == 1:
                protein[k] = np.squeeze(v, axis=-1)
    for k in ("seq_length", "num_alignments"):
        if k in protein:
            protein[k] = np.asarray(protein[k]).reshape(-1)[0]
    return protein


def randomly_replace_msa_with_unknown(protein: Dict, replace_proportion: float,
                                      rng: np.random.Generator) -> Dict:
    """Replace a fraction of MSA (non-gap) and query entries with X
    (reference data_transforms.py:164-182)."""
    msa_mask = rng.random(protein["msa"].shape) < replace_proportion
    msa_mask &= protein["msa"] != GAP_IDX
    protein["msa"] = np.where(msa_mask, X_IDX, protein["msa"])
    aatype_mask = rng.random(protein["aatype"].shape) < replace_proportion
    protein["aatype"] = np.where(aatype_mask, X_IDX, protein["aatype"])
    return protein


def sample_msa(protein: Dict, max_seq: int, keep_extra: bool,
               rng: np.random.Generator) -> Dict:
    """Keep the query row plus a random sample of `max_seq - 1` other rows;
    optionally stash the rest as `extra_*` (reference
    data_transforms.py:186-207)."""
    num_seq = protein["msa"].shape[0]
    index_order = np.concatenate(
        [[0], 1 + rng.permutation(num_seq - 1)]).astype(np.int64)
    num_sel = min(max_seq, num_seq)
    sel, not_sel = index_order[:num_sel], index_order[num_sel:]
    for k in MSA_FEATURE_NAMES:
        if k in protein:
            if keep_extra:
                protein["extra_" + k] = protein[k][not_sel]
            protein[k] = protein[k][sel]
    return protein


def add_distillation_flag(protein: Dict, distillation) -> Dict:
    protein["is_distillation"] = np.asarray(distillation)
    return protein


def sample_msa_distillation(protein: Dict, max_seq: int,
                            rng: np.random.Generator) -> Dict:
    if protein["is_distillation"] == 1:
        protein = sample_msa(protein, max_seq, keep_extra=False, rng=rng)
    return protein


def crop_extra_msa(protein: Dict, max_extra_msa: int,
                   rng: np.random.Generator) -> Dict:
    num_seq = protein["extra_msa"].shape[0]
    sel = rng.permutation(num_seq)[:min(max_extra_msa, num_seq)]
    for k in MSA_FEATURE_NAMES:
        if "extra_" + k in protein:
            protein["extra_" + k] = protein["extra_" + k][sel]
    return protein


def delete_extra_msa(protein: Dict) -> Dict:
    for k in MSA_FEATURE_NAMES:
        protein.pop("extra_" + k, None)
    return protein


def block_delete_msa(protein: Dict, msa_fraction_per_block: float,
                     num_blocks: int, randomize_num_blocks: bool,
                     rng: np.random.Generator) -> Dict:
    """Delete random contiguous blocks of MSA rows, always keeping the query
    (reference data_transforms.py:245-275; its torch version has several
    latent API errors — torch.range misuse — so semantics follow the AF2
    original it transcribes)."""
    num_seq = protein["msa"].shape[0]
    block_num_seq = int(np.floor(num_seq * msa_fraction_per_block))
    nb = (int(rng.integers(0, num_blocks + 1)) if randomize_num_blocks
          else num_blocks)
    starts = rng.integers(0, num_seq, size=(nb,))
    del_blocks = starts[:, None] + np.arange(block_num_seq)[None, :]
    del_blocks = np.clip(del_blocks, 0, num_seq - 1)
    del_indices = np.unique(del_blocks)
    keep = np.setdiff1d(np.arange(1, num_seq), del_indices,
                        assume_unique=False)
    keep = np.concatenate([[0], keep])  # query row always survives
    for k in MSA_FEATURE_NAMES:
        if k in protein:
            protein[k] = protein[k][keep]
    return protein


def nearest_neighbor_clusters(protein: Dict,
                              gap_agreement_weight: float = 0.0) -> Dict:
    """Assign each extra sequence to its nearest sampled-MSA row by weighted
    one-hot agreement (reference data_transforms.py:279-308)."""
    weights = np.concatenate([np.ones(21, np.float32),
                              gap_agreement_weight * np.ones(1, np.float32),
                              np.zeros(1, np.float32)])
    sample_oh = protein["msa_mask"][:, :, None] * make_one_hot(protein["msa"], 23)
    extra_oh = (protein["extra_msa_mask"][:, :, None]
                * make_one_hot(protein["extra_msa"], 23))
    m, r = sample_oh.shape[:2]
    n = extra_oh.shape[0]
    agreement = extra_oh.reshape(n, r * 23) @ (
        (sample_oh * weights).reshape(m, r * 23).T)
    protein["extra_cluster_assignment"] = np.argmax(agreement, axis=1).astype(np.int64)
    return protein


def unsorted_segment_sum(data: np.ndarray, segment_ids: np.ndarray,
                         num_segments: int) -> np.ndarray:
    assert segment_ids.ndim == 1 and segment_ids.shape[0] == data.shape[0]
    out = np.zeros((num_segments,) + data.shape[1:], np.float32)
    np.add.at(out, segment_ids, data.astype(np.float32))
    return out.astype(data.dtype)


def summarize_clusters(protein: Dict) -> Dict:
    """Per-cluster profile + mean deletion (reference
    data_transforms.py:336-358)."""
    num_seq = protein["msa"].shape[0]

    def csum(x):
        return unsorted_segment_sum(
            x, protein["extra_cluster_assignment"], num_seq)

    mask = protein["extra_msa_mask"]
    counts = 1e-6 + protein["msa_mask"] + csum(mask)
    msa_sum = csum(mask[:, :, None] * make_one_hot(protein["extra_msa"], 23))
    msa_sum = msa_sum + make_one_hot(protein["msa"], 23)
    protein["cluster_profile"] = msa_sum / counts[:, :, None]
    del_sum = csum(mask * protein["extra_deletion_matrix"])
    del_sum = del_sum + protein["deletion_matrix"]
    protein["cluster_deletion_mean"] = del_sum / counts
    return protein


def make_msa_mask(protein: Dict) -> Dict:
    protein["msa_mask"] = np.ones(protein["msa"].shape, np.float32)
    protein["msa_row_mask"] = np.ones(protein["msa"].shape[0], np.float32)
    return protein


def make_hhblits_profile(protein: Dict) -> Dict:
    if "hhblits_profile" in protein:
        return protein
    protein["hhblits_profile"] = make_one_hot(protein["msa"], 22).mean(0)
    return protein


def shaped_categorical(probs: np.ndarray, rng: np.random.Generator,
                       epsilon: float = 1e-10) -> np.ndarray:
    p = probs + epsilon
    p = p / p.sum(-1, keepdims=True)
    c = np.cumsum(p, axis=-1)
    u = rng.random(p.shape[:-1] + (1,))
    return (u > c[..., :-1] / c[..., -1:]).sum(-1).astype(np.int64)


def make_masked_msa(protein: Dict, uniform_prob: float, profile_prob: float,
                    same_prob: float, replace_fraction: float,
                    rng: np.random.Generator) -> Dict:
    """BERT-style MSA masking (reference data_transforms.py:434-469):
    replaced entries draw from uniform/profile/same mixture, remainder mass
    on a 23rd [MASK] class."""
    random_aa = np.asarray([0.05] * 20 + [0.0, 0.0], np.float32)
    probs = (uniform_prob * random_aa
             + profile_prob * protein["hhblits_profile"]
             + same_prob * make_one_hot(protein["msa"], 22))
    mask_prob = 1.0 - profile_prob - same_prob - uniform_prob
    assert mask_prob >= 0.0
    probs = np.pad(probs, [(0, 0)] * (probs.ndim - 1) + [(0, 1)],
                   constant_values=mask_prob)
    mask_position = rng.random(protein["msa"].shape) < replace_fraction
    bert_msa = shaped_categorical(probs, rng)
    protein["bert_mask"] = mask_position.astype(np.float32)
    protein["true_msa"] = protein["msa"]
    protein["msa"] = np.where(mask_position, bert_msa, protein["msa"])
    return protein


def make_fixed_size(protein: Dict, shape_schema: Dict[str, Sequence],
                    msa_cluster_size: int, extra_msa_size: int,
                    num_res: int = 0, num_templates: int = 0) -> Dict:
    """Zero-pad every feature to the schema's fixed sizes (reference
    data_transforms.py:473-508) — the reference's analog of this
    framework's length bucketing (data/featurize.py:pad_features)."""
    pad_size_map = {NUM_RES: num_res, NUM_MSA_SEQ: msa_cluster_size,
                    NUM_EXTRA_SEQ: extra_msa_size,
                    NUM_TEMPLATES: num_templates}
    for k, v in protein.items():
        if k == "extra_cluster_assignment" or k not in shape_schema:
            continue
        schema = shape_schema[k]
        assert len(v.shape) == len(schema), \
            f"rank mismatch for {k}: {v.shape} vs {schema}"
        pad_size = [pad_size_map.get(s2) or s1
                    for s1, s2 in zip(v.shape, schema)]
        padding = [(0, p - s) for p, s in zip(pad_size, v.shape)]
        if any(p for _, p in padding):
            protein[k] = np.pad(v, padding)
    return protein


def make_msa_feat(protein: Dict) -> Dict:
    """Concatenate per-row MSA features and per-residue target features
    (reference data_transforms.py:512-559)."""
    has_break = np.clip(
        protein["between_segment_residues"].astype(np.float32), 0, 1)
    aatype_1hot = make_one_hot(protein["aatype"], 21)
    target_feat = [has_break[..., None], aatype_1hot]

    msa_1hot = make_one_hot(protein["msa"], 23)
    has_deletion = np.clip(protein["deletion_matrix"], 0.0, 1.0)
    deletion_value = np.arctan(protein["deletion_matrix"] / 3.0) * (2.0 / np.pi)
    msa_feat = [msa_1hot, has_deletion[..., None], deletion_value[..., None]]

    if "cluster_profile" in protein:
        deletion_mean_value = (np.arctan(protein["cluster_deletion_mean"] / 3.0)
                               * (2.0 / np.pi))
        msa_feat += [protein["cluster_profile"], deletion_mean_value[..., None]]
    if "extra_deletion_matrix" in protein:
        protein["extra_has_deletion"] = np.clip(
            protein["extra_deletion_matrix"], 0.0, 1.0)
        protein["extra_deletion_value"] = (
            np.arctan(protein["extra_deletion_matrix"] / 3.0) * (2.0 / np.pi))

    protein["msa_feat"] = np.concatenate(msa_feat, axis=-1).astype(np.float32)
    protein["target_feat"] = np.concatenate(target_feat, axis=-1).astype(np.float32)
    return protein


def select_feat(protein: Dict, feature_list: Sequence[str]) -> Dict:
    return {k: v for k, v in protein.items() if k in feature_list}


def crop_templates(protein: Dict, max_templates: int) -> Dict:
    for k, v in protein.items():
        if k.startswith("template_"):
            protein[k] = v[:max_templates]
    return protein


def random_crop_to_size(protein: Dict, crop_size: int, max_templates: int,
                        shape_schema: Dict[str, Sequence],
                        rng: np.random.Generator,
                        subsample_templates: bool = False) -> Dict:
    """Random contiguous crop to `crop_size` residues, with optional
    template subsampling (reference data_transforms.py:1114-1194). The
    right-anchor trick biases crops toward including the chain end unless
    use_clamped_fape forces it."""
    seq_length = int(protein["seq_length"])
    num_templates = (protein["template_mask"].shape[-1]
                     if "template_mask" in protein else 0)
    subsample_templates = bool(subsample_templates and num_templates)

    num_res_crop_size = min(seq_length, crop_size)

    if subsample_templates:
        templates_crop_start = int(rng.integers(0, num_templates + 1))
        templates_select_indices = rng.permutation(num_templates)
    else:
        templates_crop_start = 0
        templates_select_indices = None
    num_templates_crop_size = min(
        num_templates - templates_crop_start, max_templates)

    n = seq_length - num_res_crop_size
    if protein.get("use_clamped_fape", 0) == 1.0:
        right_anchor = n
    else:
        right_anchor = n - int(rng.integers(0, n + 1))
    num_res_crop_start = int(rng.integers(0, right_anchor + 1))

    for k, v in protein.items():
        if k not in shape_schema or (
                "template" not in k and NUM_RES not in shape_schema[k]):
            continue
        if k.startswith("template") and subsample_templates:
            v = v[templates_select_indices]
        slices = []
        for i, (dim_size, dim) in enumerate(zip(shape_schema[k], v.shape)):
            if i == 0 and k.startswith("template"):
                start, size = templates_crop_start, num_templates_crop_size
            elif dim_size == NUM_RES:
                start, size = num_res_crop_start, num_res_crop_size
            else:
                start, size = 0, dim
            slices.append(slice(start, start + size))
        protein[k] = v[tuple(slices)]

    protein["seq_length"] = np.asarray(num_res_crop_size,
                                       np.asarray(protein["seq_length"]).dtype)
    return protein
