"""FID InceptionV3 port: graph shapes + converter round-trip.

The official pt_inception-2015-12-05 weights cannot be downloaded in this
image (zero egress); numerical parity against torch is therefore covered by
a converter ROUND-TRIP (synthesised torch-layout state_dict → flax →
identical structure, loud failure on any unexpected key) plus shape/graph
assertions.  With the weights file supplied locally,
``InceptionFeatureExtractor(weights_path)`` is the ready-made classic-FID
extractor (see dmtpu/eval/inception.py docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmtpu.eval.inception import FIDInceptionV3, convert_inception_checkpoint

CPU = jax.devices("cpu")[0]


@pytest.fixture(scope="module")
def variables():
    with jax.default_device(CPU):
        model = FIDInceptionV3()
        return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))


def _torch_layout_state_dict(variables):
    """Reverse-map flax variables to the torch key/value layout."""
    sd = {}

    def walk(tree, path, coll):
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                walk(v, p, coll)
            else:
                coll[p] = np.asarray(v)
        return coll

    for p, v in walk(variables["params"], (), {}).items():
        if p[-1] == "kernel" and v.ndim == 4:
            sd[".".join(p[:-1]) + ".weight"] = v.transpose(3, 2, 0, 1)
        elif p == ("fc", "kernel"):
            sd["fc.weight"] = v.T
        elif p[-1] == "bias":
            sd[".".join(p[:-1]) + ".bias"] = v
        elif p[-1] == "scale":
            sd[".".join(p[:-1]) + ".weight"] = v
        else:
            raise AssertionError(p)
    for p, v in walk(variables["batch_stats"], (), {}).items():
        sd[".".join(p[:-1]) + ".running_" + {"mean": "mean", "var": "var"}[p[-1]]] = v
    return sd


def test_forward_shapes(variables):
    with jax.default_device(CPU):
        model = FIDInceptionV3()
        pool3, logits = model.apply(variables, jnp.zeros((2, 299, 299, 3)))
        assert pool3.shape == (2, 2048)
        assert logits.shape == (2, 1008)
        # resize path: CIFAR-sized input goes through the same graph
        pool3b, _ = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
        assert pool3b.shape == (2, 2048)


def test_param_count(variables):
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(variables["params"]))
    # conv/bn/fc parameters of the FID InceptionV3 (no AuxLogits), 1008-way fc
    assert 23_000_000 < n < 26_000_000


def test_converter_round_trip(variables):
    with jax.default_device(CPU):
        sd = _torch_layout_state_dict(variables)
        # the torch file also carries num_batches_tracked; must be ignored
        sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.asarray(0)
        restored = convert_inception_checkpoint(sd)
        assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(variables)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), restored, variables)
        assert max(jax.tree.leaves(diffs)) == 0.0


def test_converter_rejects_unknown_keys(variables):
    sd = _torch_layout_state_dict(variables)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((1, 2, 3))
    with pytest.raises(ValueError):
        convert_inception_checkpoint(sd)


def test_inception_is_from_logits(variables):
    """IS wiring: softmax logits from the graph feed inception_score."""
    from dmtpu.eval import inception_score

    with jax.default_device(CPU):
        model = FIDInceptionV3()
        rng = jax.random.PRNGKey(1)
        x = jax.random.uniform(rng, (8, 64, 64, 3))
        _, logits = model.apply(variables, x)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        m, s = inception_score(probs, splits=2)
        assert m >= 1.0 and np.isfinite(s)


def _torch_blocks():
    """Torch implementations of the published FID-Inception block variants,
    built fresh from torch.nn primitives — the numerical oracle for the Flax
    port.  Attribute names mirror the pt_inception state_dict layout so
    ``convert_inception_checkpoint`` maps them mechanically."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class TBasic(tnn.Module):
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False)
            self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avg_nopad(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    class TInceptionA(tnn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = TBasic(cin, 64, 1)
            self.branch5x5_1 = TBasic(cin, 48, 1)
            self.branch5x5_2 = TBasic(48, 64, 5, padding=2)
            self.branch3x3dbl_1 = TBasic(cin, 64, 1)
            self.branch3x3dbl_2 = TBasic(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = TBasic(96, 96, 3, padding=1)
            self.branch_pool = TBasic(cin, pool_features, 1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(avg_nopad(x)),
            ], dim=1)

    class TInceptionB(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = TBasic(cin, 384, 3, stride=2)
            self.branch3x3dbl_1 = TBasic(cin, 64, 1)
            self.branch3x3dbl_2 = TBasic(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = TBasic(96, 96, 3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2),
            ], dim=1)

    class TInceptionC(tnn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = TBasic(cin, 192, 1)
            self.branch7x7_1 = TBasic(cin, c7, 1)
            self.branch7x7_2 = TBasic(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7_3 = TBasic(c7, 192, (7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = TBasic(cin, c7, 1)
            self.branch7x7dbl_2 = TBasic(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = TBasic(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = TBasic(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = TBasic(c7, 192, (1, 7), padding=(0, 3))
            self.branch_pool = TBasic(cin, 192, 1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_1(x)
            bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
            return torch.cat([
                self.branch1x1(x), b7, bd, self.branch_pool(avg_nopad(x)),
            ], dim=1)

    class TInceptionD(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = TBasic(cin, 192, 1)
            self.branch3x3_2 = TBasic(192, 320, 3, stride=2)
            self.branch7x7x3_1 = TBasic(cin, 192, 1)
            self.branch7x7x3_2 = TBasic(192, 192, (1, 7), padding=(0, 3))
            self.branch7x7x3_3 = TBasic(192, 192, (7, 1), padding=(3, 0))
            self.branch7x7x3_4 = TBasic(192, 192, 3, stride=2)

        def forward(self, x):
            b7 = self.branch7x7x3_2(self.branch7x7x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(b7))
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)), b7,
                F.max_pool2d(x, 3, stride=2),
            ], dim=1)

    class TInceptionE(tnn.Module):
        def __init__(self, cin, pool):
            super().__init__()
            self.pool = pool
            self.branch1x1 = TBasic(cin, 320, 1)
            self.branch3x3_1 = TBasic(cin, 384, 1)
            self.branch3x3_2a = TBasic(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3_2b = TBasic(384, 384, (3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = TBasic(cin, 448, 1)
            self.branch3x3dbl_2 = TBasic(448, 384, 3, padding=1)
            self.branch3x3dbl_3a = TBasic(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = TBasic(384, 384, (3, 1), padding=(1, 0))
            self.branch_pool = TBasic(cin, 192, 1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], dim=1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], dim=1)
            pooled = (avg_nopad(x) if self.pool == "avg"
                      else F.max_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(pooled)], dim=1)

    return TBasic, TInceptionA, TInceptionB, TInceptionC, TInceptionD, TInceptionE


def _randomize(model, seed=0):
    """Non-trivial random weights + BN stats, magnitudes kept tame so deep
    stacks don't blow up activation scales."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.05)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
            elif isinstance(m, tnn.Linear):
                m.weight.normal_(0, 0.01)
                m.bias.normal_(0, 0.01)
    return model.eval()


@pytest.mark.parametrize("which", ["A", "B", "C", "D", "E_avg", "E_max"])
def test_inception_blocks_parity_vs_torch_oracle(which):
    """Every FID block variant vs a torch oracle of the published
    architecture (count_include_pad=False avg pools; Mixed_7c's max pool)."""
    import torch

    from dmtpu.eval import inception as inc

    _, TA, TB, TC, TD, TE = _torch_blocks()
    build = {
        "A": (lambda: TA(192, 32), lambda: inc.InceptionA(32), 192),
        "B": (lambda: TB(288), lambda: inc.InceptionB(), 288),
        "C": (lambda: TC(768, 160), lambda: inc.InceptionC(160), 768),
        "D": (lambda: TD(768), lambda: inc.InceptionD(), 768),
        "E_avg": (lambda: TE(1280, "avg"), lambda: inc.InceptionE("avg"), 1280),
        "E_max": (lambda: TE(2048, "max"), lambda: inc.InceptionE("max"), 2048),
    }[which]
    t_build, j_build, cin = build
    ref = _randomize(t_build())
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_inception_checkpoint(sd)

    rs = np.random.RandomState(1)
    hw = 17 if which in ("A", "B", "C") else 9
    x = rs.rand(2, cin, hw, hw).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    with jax.default_device(CPU):
        got = j_build().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_inception_full_graph_parity_vs_torch_oracle():
    """The WHOLE FID graph (stem → Mixed_7c → global pool → 1008 logits) vs
    a torch oracle assembled from the block oracles, random weights routed
    through ``convert_inception_checkpoint`` — a conversion or wiring bug
    anywhere in the graph fails here, so the FID gate is trustworthy the day
    the official pt_inception weights file is supplied."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    TBasic, TA, TB, TC, TD, TE = _torch_blocks()

    class TFIDInception(tnn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = TBasic(3, 32, 3, stride=2)
            self.Conv2d_2a_3x3 = TBasic(32, 32, 3)
            self.Conv2d_2b_3x3 = TBasic(32, 64, 3, padding=1)
            self.Conv2d_3b_1x1 = TBasic(64, 80, 1)
            self.Conv2d_4a_3x3 = TBasic(80, 192, 3)
            self.Mixed_5b = TA(192, 32)
            self.Mixed_5c = TA(256, 64)
            self.Mixed_5d = TA(288, 64)
            self.Mixed_6a = TB(288)
            self.Mixed_6b = TC(768, 128)
            self.Mixed_6c = TC(768, 160)
            self.Mixed_6d = TC(768, 160)
            self.Mixed_6e = TC(768, 192)
            self.Mixed_7a = TD(768)
            self.Mixed_7b = TE(1280, "avg")
            self.Mixed_7c = TE(2048, "max")
            self.fc = tnn.Linear(2048, 1008)

        def forward(self, x):
            x = 2.0 * x - 1.0
            x = self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x))
            x = F.max_pool2d(self.Conv2d_2b_3x3(x), 3, stride=2)
            x = F.max_pool2d(self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x)), 3, stride=2)
            x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
            x = self.Mixed_6a(x)
            x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(x))))
            x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
            pool3 = F.adaptive_avg_pool2d(x, 1).flatten(1)
            return pool3, self.fc(pool3)

    ref = _randomize(TFIDInception(), seed=3)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_inception_checkpoint(sd)

    rs = np.random.RandomState(5)
    x = rs.rand(2, 3, 299, 299).astype(np.float32)
    with torch.no_grad():
        want_pool, want_logits = (t.numpy() for t in ref(torch.from_numpy(x)))
    with jax.default_device(CPU):
        got_pool, got_logits = FIDInceptionV3().apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert np.abs(np.asarray(got_pool) - want_pool).max() < 1e-4
    assert np.abs(np.asarray(got_logits) - want_logits).max() < 1e-4
    np.testing.assert_allclose(np.asarray(got_pool), want_pool, rtol=1e-3, atol=1e-5)
