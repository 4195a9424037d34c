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


def test_inception_blocks_parity_vs_torch_oracle():
    """Cross-check the Flax block math against a torch implementation of the
    same published architecture (BasicConv2d + InceptionA with the FID
    count_include_pad=False pool), built here from torch.nn primitives."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    from dmtpu.eval.inception import InceptionA

    class TBasic(tnn.Module):
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False)
            self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

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
            bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(bp),
            ], dim=1)

    torch.manual_seed(0)
    ref = TInceptionA(192, 32).eval()
    # randomise BN stats so the normalisation path is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_inception_checkpoint(sd)

    rs = np.random.RandomState(1)
    x = rs.rand(2, 192, 17, 17).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    with jax.default_device(CPU):
        got = InceptionA(32).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
