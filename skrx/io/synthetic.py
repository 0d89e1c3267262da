"""Synthetic implicit-feedback dataset generation.

No reference counterpart: the reference's tests download MovieLens-100k over
the network (skrec/tests/test_dataset.py:14-26). This module generates a
reproducible power-law interaction log with the same file layout, so tests
and benchmarks run hermetically (no network).
"""
import os
import numpy as np
import pandas as pd

from .preprocessor import Preprocessor

__all__ = ["make_interactions", "make_dataset_dir"]


def make_interactions(num_users: int = 200, num_items: int = 300,
                      num_ratings: int = 5000, seed: int = 2021,
                      latent_dim: int = 8,
                      latent_strength: float = 3.0) -> pd.DataFrame:
    """Generate a (user, item, rating, time) log with Zipfian item popularity
    plus low-rank user-item affinity (so factor models genuinely beat the
    popularity baseline), with no duplicate (user, item) pairs."""
    rng = np.random.default_rng(seed)
    # Zipf-ish popularity over items.
    item_w = 1.0 / np.arange(1, num_items + 1) ** 0.8
    item_logit = np.log(item_w / item_w.sum())
    user_w = 1.0 / np.arange(1, num_users + 1) ** 0.5
    user_p = user_w / user_w.sum()

    # Low-rank latent structure: users prefer items aligned with their factor.
    u_vec = rng.standard_normal((num_users, latent_dim)) / np.sqrt(latent_dim)
    i_vec = rng.standard_normal((num_items, latent_dim)) / np.sqrt(latent_dim)
    affinity = latent_strength * (u_vec @ i_vec.T)  # (U, I)
    logits = affinity + item_logit[None, :]
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)

    oversample = int(num_ratings * 2.5)
    users = rng.choice(num_users, size=oversample, p=user_p)
    # Vectorized per-user categorical draw via inverse-CDF.
    cdf = np.cumsum(probs, axis=1)
    r = rng.random(oversample)
    items = np.array([np.searchsorted(cdf[u], x) for u, x in zip(users, r)])
    items = np.minimum(items, num_items - 1)
    df = pd.DataFrame({"user": users, "item": items})
    df = df.drop_duplicates(subset=["user", "item"]).head(num_ratings)
    # Every user needs >= 3 interactions so leave-out splits are non-degenerate.
    base = pd.DataFrame({
        "user": np.repeat(np.arange(num_users), 3),
        "item": rng.integers(0, num_items, size=3 * num_users),
    })
    df = pd.concat([base, df]).drop_duplicates(subset=["user", "item"])
    n = len(df)
    df = df.assign(rating=rng.integers(1, 6, size=n).astype(np.int64),
                   time=rng.integers(1_000_000, 2_000_000, size=n).astype(np.int64))
    return df.reset_index(drop=True)


def make_dataset_dir(root: str, name: str = "synth",
                     num_users: int = 200, num_items: int = 300,
                     num_ratings: int = 5000, seed: int = 2021,
                     by_time: bool = True,
                     split: str = "ratio",
                     columns: str = "UIRT",
                     latent_dim: int = 8,
                     latent_strength: float = 3.0,
                     with_mm: bool = False,
                     img_dim: int = 24,
                     txt_dim: int = 16) -> str:
    """Generate, preprocess, split and save a dataset; returns its dir path
    (ready for :class:`skrx.io.RSDataset`)."""
    df = make_interactions(num_users, num_items, num_ratings, seed,
                           latent_dim=latent_dim,
                           latent_strength=latent_strength)
    if columns == "UI":
        df = df[["user", "item"]]
    elif columns == "UIR":
        df = df[["user", "item", "rating"]]
    elif columns == "UIT":
        df = df[["user", "item", "time"]]
    proc = Preprocessor()
    os.makedirs(root, exist_ok=True)
    proc.load_dataframe(df, columns=columns, name=name, dir_path=root)
    proc.drop_duplicates()
    proc.filter_data(user_min=3, item_min=1)
    proc.remap_data_id()
    if split == "ratio":
        proc.split_data_by_ratio(0.7, 0.1, 0.2, by_time=by_time)
    elif split == "leave_out":
        proc.split_data_by_leave_out(valid=1, test=1, by_time=by_time)
    else:
        raise ValueError(f"unknown split {split!r}")
    out_dir = proc.save_data(root)

    if with_mm:
        # item modality features (.img.npz/.txt.npz, reference MMData layout)
        rng = np.random.default_rng(seed + 1)
        n_items_final = proc.all_data["item"].nunique()
        prefix = os.path.join(out_dir, os.path.basename(out_dir))
        np.savez(prefix + ".img.npz",
                 rng.standard_normal((n_items_final, img_dim)).astype(np.float32))
        np.savez(prefix + ".txt.npz",
                 rng.standard_normal((n_items_final, txt_dim)).astype(np.float32))
    return out_dir
