"""Datasets over preprocessed pickles or PDB files, with length bucketing.

Capability parity with the reference dataset layer
(`/root/reference/src/data/components/dataset.py:146-320`): map-style access
over `.pkl` feature dicts or `.pdb` files, CSV metadata filtering, LRU cache,
train/val splitting — redesigned around fixed-shape *length buckets* instead
of ragged pad-collate (protein_datamodule.py:9-57), so every batch has a
static XLA shape.
"""
from __future__ import annotations

import pickle
from dataclasses import dataclass
from functools import lru_cache
from glob import glob
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..io.protein import Protein, from_pdb_string
from .featurize import FeaturizeConfig, featurize, pad_features, pick_bucket


@dataclass
class MetadataFilter:
    """Pandas row filter over a metadata CSV (reference dataset.py:146)."""
    min_len: Optional[int] = None
    max_len: Optional[int] = None
    min_chains: Optional[int] = None
    max_chains: Optional[int] = None
    max_resolution: Optional[float] = None
    methods: Optional[Sequence[str]] = None

    def __call__(self, df):
        if self.min_len is not None and "seq_len" in df:
            df = df[df.seq_len >= self.min_len]
        if self.max_len is not None and "seq_len" in df:
            df = df[df.seq_len <= self.max_len]
        if self.min_chains is not None and "num_chains" in df:
            df = df[df.num_chains >= self.min_chains]
        if self.max_chains is not None and "num_chains" in df:
            df = df[df.num_chains <= self.max_chains]
        if self.max_resolution is not None and "resolution" in df:
            df = df[df.resolution <= self.max_resolution]
        if self.methods is not None and "method" in df:
            df = df[df.method.isin(self.methods)]
        return df


class ProteinDataset:
    """Random-access dataset over .pkl feature dicts or .pdb files."""

    def __init__(self, path: str, suffix: str = "pkl",
                 transform: FeaturizeConfig = FeaturizeConfig(),
                 metadata_filter: Optional[MetadataFilter] = None,
                 accession_codes: Optional[Sequence[str]] = None,
                 seed: int = 42,
                 path_to_seq_embedding: Optional[str] = None):
        """`path_to_seq_embedding`: directory of per-target language-model
        embedding sidecars, `<accession_code>.pt` (torch, ESM-650M layer-33
        `representations`) or `<accession_code>.npy` — loaded into the
        `seq_emb` feature (reference dataset.py:276-284)."""
        self.transform = transform
        self.seed = seed
        self.path_to_seq_embedding = path_to_seq_embedding
        p = Path(path)
        if p.is_file() and p.suffix == ".csv":
            import pandas as pd
            df = pd.read_csv(p)
            if metadata_filter is not None:
                df = metadata_filter(df)
            if "seq_len" in df:
                df = df.sort_values("seq_len", ascending=False)
            self.files = [str(f) for f in df["processed_path"]]
        elif p.is_file():
            self.files = [str(p)]
        elif p.is_dir():
            self.files = sorted(glob(str(p / f"**/*.{suffix}"), recursive=True))
        else:
            self.files = sorted(glob(str(p)))
        if accession_codes:
            codes = set(accession_codes)
            self.files = [f for f in self.files if Path(f).stem.split("_")[0] in codes
                          or Path(f).stem in codes]
        if not self.files:
            raise FileNotFoundError(f"no dataset files under {path!r}")

    def __len__(self):
        return len(self.files)

    def accession_code(self, idx: int) -> str:
        return Path(self.files[idx]).stem

    def _load(self, idx: int) -> Protein:
        # Per-instance LRU (reference dataset.py:254 uses lru_cache(100)):
        # a class-level @lru_cache on the bound method would key entries by
        # (self, idx) with a strong reference to self, keeping every
        # dataset instance (e.g. one per sweep trial) alive for the
        # process lifetime.
        if not hasattr(self, "_load_cache"):
            self._load_cache = lru_cache(maxsize=100)(self._load_uncached)
        return self._load_cache(idx)

    def _load_uncached(self, idx: int) -> Protein:
        f = Path(self.files[idx])
        if f.suffix == ".pkl":
            with open(f, "rb") as fh:
                d = pickle.load(fh)
            return Protein(
                atom_positions=np.asarray(d["atom_positions"], np.float32),
                atom_mask=np.asarray(d["atom_mask"], np.float32),
                aatype=np.asarray(d["aatype"], np.int32),
                residue_index=np.asarray(d["residue_index"], np.int32),
                chain_index=np.asarray(d.get("chain_index",
                                             np.zeros(len(d["aatype"]))), np.int32),
                b_factors=np.asarray(d.get(
                    "b_factors", np.zeros_like(d["atom_mask"])), np.float32),
            )
        return from_pdb_string(f.read_text())

    def _load_seq_embedding(self, code: str) -> Optional[np.ndarray]:
        root = Path(self.path_to_seq_embedding)
        npy = root / f"{code}.npy"
        if npy.exists():
            return np.load(npy).astype(np.float32)
        pt = root / f"{code}.pt"
        if pt.exists():
            import torch
            d = torch.load(pt, map_location="cpu", weights_only=False)
            rep = d["representations"][33] if isinstance(d, dict) else d
            return np.asarray(rep, dtype=np.float32)
        raise FileNotFoundError(
            f"no sequence-embedding sidecar for {code!r} under {root}")

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        prot = self._load(idx)
        rng = np.random.RandomState((self.seed, idx))
        feats = featurize(prot, self.transform, rng)
        if self.path_to_seq_embedding is not None:
            feats["seq_emb"] = self._load_seq_embedding(self.accession_code(idx))
        feats["accession_code"] = self.accession_code(idx)
        return feats


def split_dataset(n: int, fractions=(0.95, 0.05), seed: int = 42):
    """Deterministic index split (reference protein_datamodule.py:169)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_train = int(round(n * fractions[0])) if n > 1 else n
    return perm[:n_train], perm[n_train:]


class BucketedLoader:
    """Batches examples whose padded length falls into the same bucket.

    Greedy bucketing over a shuffled epoch: maintains one open batch per
    bucket; yields a batch when it reaches `batch_size`. Every yielded batch
    is a dict of stacked arrays with static shape (batch_size, bucket, ...)
    — partially filled batches are padded with repeated examples and an
    `example_mask` marks the real rows.

    With `num_workers > 0`, featurization runs ahead on a thread pool
    (pickle/PDB I/O and the numpy transform chain release the GIL), keeping
    the accelerator off the data critical path — the reference's DataLoader
    workers (protein_datamodule.py:181-195, num_workers=4). Examples are
    consumed in submission order, so batches are identical to the inline
    path for the same seed."""

    def __init__(self, dataset: ProteinDataset, indices: Sequence[int],
                 batch_size: int, buckets: Sequence[int] = (64, 128, 256, 384, 512),
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False,
                 num_workers: int = 0, prefetch: int = 4):
        self.ds = dataset
        self.indices = np.asarray(list(indices), dtype=int)
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch

    def _epoch_order(self):
        order = self.indices.copy()
        if self.shuffle:
            np.random.RandomState(self.seed).shuffle(order)
            self.seed += 1
        return order

    def _featurized(self, order):
        """Yield featurized examples for `order`, inline or via a bounded
        thread-pool window (bounded so a large epoch never materializes)."""
        if self.num_workers <= 0:
            for idx in order:
                yield self.ds[int(idx)]
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window = self.num_workers * max(self.prefetch, 1)
        with ThreadPoolExecutor(self.num_workers) as ex:
            pending = deque()
            it = iter(order)
            for idx in it:
                pending.append(ex.submit(self.ds.__getitem__, int(idx)))
                if len(pending) >= window:
                    break
            while pending:
                yield pending.popleft().result()
                for idx in it:
                    pending.append(ex.submit(self.ds.__getitem__, int(idx)))
                    break

    def __iter__(self):
        open_batches: Dict[int, List[dict]] = {}
        for feats in self._featurized(self._epoch_order()):
            bucket = pick_bucket(feats["aatype"].shape[0], self.buckets)
            open_batches.setdefault(bucket, []).append(feats)
            if len(open_batches[bucket]) == self.batch_size:
                yield self._collate(open_batches.pop(bucket), bucket)
        for bucket, items in open_batches.items():
            if not self.drop_last:
                yield self._collate(items, bucket)

    def _collate(self, items: List[dict], bucket: int) -> Dict[str, np.ndarray]:
        n_real = len(items)
        while len(items) < self.batch_size:  # pad with repeats -> static shape
            items.append(items[len(items) % n_real])
        padded = [pad_features(f, bucket) for f in items]
        batch = {}
        for k in padded[0]:
            if isinstance(padded[0][k], np.ndarray):
                batch[k] = np.stack([p[k] for p in padded])
        batch["example_mask"] = (np.arange(self.batch_size) < n_real).astype(np.float32)
        batch["accession_code"] = [p.get("accession_code", "") for p in padded]
        return batch
