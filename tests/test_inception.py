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
