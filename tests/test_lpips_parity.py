"""LPIPS numerical parity against a torch re-derivation of the reference
lpipsPyTorch (modules/lpips.py + networks.py + utils.py), with SHARED random
weights injected into both sides.

Pretrained VGG16/LPIPS weights cannot be downloaded in this environment, so
this test proves the JAX port computes the IDENTICAL function of the
weights: once a real weights npz is provided via $IBGS_LPIPS_WEIGHTS
(scripts/export_lpips_weights.py), the metric matches the reference
bit-for-bit up to float tolerance."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ibgs_tpu.eval.lpips import _CFG, LPIPS  # noqa: E402

_LIN_CH = [64, 128, 256, 512, 512]


def _random_weights(seed=0):
    rng = np.random.default_rng(seed)
    convs, lins = [], []
    cin = 3
    for c in _CFG:
        if c == "M":
            continue
        convs.append((rng.normal(0, 0.08, (c, cin, 3, 3)).astype(np.float32),
                      rng.normal(0, 0.02, (c,)).astype(np.float32)))
        cin = c
    for nc in _LIN_CH:
        lins.append(np.abs(rng.normal(0, 0.05, (1, nc, 1, 1))
                           ).astype(np.float32))
    return convs, lins


def _torch_lpips(convs, lins, a, b):
    """Re-derivation of the reference pipeline: z-score of the raw [0,1]
    input (networks.py:52 — no x2-1 rescale), VGG16 features tapped after
    target modules [4,9,16,23,30], channel-normalised with eps OUTSIDE the
    sqrt (utils.py:6-8), squared diff → 1x1 head → spatial mean → sum."""
    import torch.nn.functional as F
    mean = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    std = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(x):
        x = torch.from_numpy(np.asarray(x, np.float32))
        x = x.permute(2, 0, 1)[None]
        x = (x - mean) / std
        out = []
        ci = 0
        i = 0                     # torchvision module counter (1-based)
        for c in _CFG:
            if c == "M":
                x = F.max_pool2d(x, 2, 2)
                i += 1
            else:
                w, bb = convs[ci]
                x = F.conv2d(x, torch.from_numpy(w), torch.from_numpy(bb),
                             padding=1)
                x = F.relu(x)
                ci += 1
                i += 2
            if i in (4, 9, 16, 23, 30):
                n = torch.sqrt((x ** 2).sum(1, keepdim=True))
                out.append(x / (n + 1e-10))
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for f1, f2, lin in zip(fa, fb, lins):
        d = (f1 - f2) ** 2
        r = F.conv2d(d, torch.from_numpy(lin))
        total = total + r.mean((2, 3))
    return float(total)


def test_lpips_matches_torch_rederivation(tmp_path):
    convs, lins = _random_weights(3)
    # exercise the real npz load path
    d = {}
    for i, (w, b) in enumerate(convs):
        d[f"conv{i}_w"], d[f"conv{i}_b"] = w, b
    for j, lin in enumerate(lins):
        d[f"lin{j}_w"] = lin
    p = tmp_path / "lpips.npz"
    np.savez(p, **d)
    model = LPIPS.from_npz(str(p))

    rng = np.random.default_rng(11)
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ours = float(model(a, b))
    ref = _torch_lpips(convs, lins, a, b)
    assert ours == pytest.approx(ref, rel=2e-4, abs=1e-6), (ours, ref)
    # identical images → exactly zero distance
    assert float(model(a, a)) == pytest.approx(0.0, abs=1e-9)
