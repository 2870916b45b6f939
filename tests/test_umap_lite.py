"""utils/umap_lite.py: the in-repo UMAP used for latent scatter plots."""
import numpy as np

from ipoke_tpu.utils.umap_lite import UMAPLite


def _blobs(rng, n_per=60, dim=12, sep=8.0, n_blobs=3):
    xs, labels = [], []
    for i in range(n_blobs):
        c = np.zeros(dim)
        c[i] = sep
        xs.append(rng.standard_normal((n_per, dim)) + c)
        labels.append(np.full(n_per, i))
    return np.concatenate(xs), np.concatenate(labels)


def test_umap_separates_clusters():
    rng = np.random.default_rng(0)
    x, y = _blobs(rng)
    emb = UMAPLite(n_epochs=150, seed=1).fit_transform(x)
    assert emb.shape == (len(x), 2)
    assert np.all(np.isfinite(emb))
    cents = np.stack([emb[y == i].mean(0) for i in range(3)])
    intra = np.mean([np.linalg.norm(emb[y == i] - cents[i], axis=1).mean() for i in range(3)])
    inter = np.mean([
        np.linalg.norm(cents[i] - cents[j])
        for i in range(3) for j in range(i + 1, 3)
    ])
    # clusters must be tight relative to their separation
    assert inter > 2.0 * intra, (intra, inter)
    # and the nearest-centroid rule in embedding space must recover the labels
    pred = np.argmin(
        np.linalg.norm(emb[:, None, :] - cents[None, :, :], axis=2), axis=1
    )
    assert (pred == y).mean() > 0.95


def test_umap_tiny_input_degenerate_path():
    x = np.random.default_rng(0).standard_normal((5, 7))
    emb = UMAPLite().fit_transform(x)
    assert emb.shape == (5, 2) and np.all(np.isfinite(emb))


def test_latent_scatter_uses_umap(tmp_path):
    from ipoke_tpu.utils.logging import latent_scatter

    rng = np.random.default_rng(0)
    x, _ = _blobs(rng, n_per=40)
    path = latent_scatter(
        str(tmp_path / "scatter.png"),
        {"posterior": x[:60], "samples": x[60:]},
    )
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 0
