"""Weight interchange tests: self-contained ONNX writer/reader round-trip
and OpenVINO IR import against the reference's shipped XML graphs."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import jax
import jax.numpy as jnp

from gpd_tpu.net import lenet
from gpd_tpu.net.onnx_io import (export_params_onnx, load_params_onnx,
                                 load_params_openvino)

OPENVINO_XML = "/root/reference/models/openvino/fp32/single_view_15_channels.xml"


class TestOnnxRoundtrip:
    def test_roundtrip_exact(self, tmp_path, rng):
        params = lenet.init_params(jax.random.PRNGKey(1), 15)
        path = str(tmp_path / "net.onnx")
        export_params_onnx(params, path, 15)
        back = load_params_onnx(path)
        assert set(back) == set(params)
        for k in params:
            np.testing.assert_array_equal(np.asarray(params[k]),
                                          back[k], err_msg=k)

    def test_roundtrip_through_load_params(self, tmp_path, rng):
        """lenet.load_params dispatches .onnx, and the reloaded net scores
        identically."""
        params = lenet.init_params(jax.random.PRNGKey(2), 3)
        path = str(tmp_path / "net3.onnx")
        export_params_onnx(params, path, 3)
        back = lenet.load_params(path, 3)
        x = rng.integers(0, 256, size=(4, 60, 60, 3)).astype(np.uint8)
        a = np.asarray(lenet.score(params, jnp.asarray(x)))
        b = np.asarray(lenet.score(back, jnp.asarray(x)))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_ccfff_variant(self, tmp_path):
        params = lenet.init_params_ccfff(jax.random.PRNGKey(3), 15)
        path = str(tmp_path / "ccfff.onnx")
        export_params_onnx(params, path, 15)
        back = load_params_onnx(path)
        assert "fc3_w" in back
        np.testing.assert_array_equal(np.asarray(params["fc3_w"]),
                                      back["fc3_w"])

    def test_ccfff_forward(self, rng):
        """NetCCFFF forward runs with non-500 fc1 width (the NHWC fc1-column
        permutation must be width-agnostic, not hardcode Net's 500 rows)."""
        params = lenet.init_params_ccfff(jax.random.PRNGKey(4), 15)
        x = rng.integers(0, 256, size=(3, 60, 60, 15)).astype(np.uint8)
        logits = lenet.forward(params, jnp.asarray(x))
        assert logits.shape == (3, 2)
        assert np.isfinite(np.asarray(logits)).all()


class TestOpenVinoImport:
    def test_reference_xml_with_synthetic_bin(self, tmp_path, rng):
        """The shipped IR XML (its .bin blob is missing from the snapshot)
        parses and indexes a synthesized .bin correctly: shapes follow the
        layer dims, values land at the declared offsets."""
        tree = ET.parse(OPENVINO_XML)
        size = 0
        for blobs in tree.getroot().iter("blobs"):
            for b in blobs:
                size = max(size, int(b.get("offset")) + int(b.get("size")))
        vals = rng.standard_normal(size // 4).astype("<f4")
        bin_path = str(tmp_path / "weights.bin")
        vals.tofile(bin_path)

        p = load_params_openvino(OPENVINO_XML, bin_path)
        assert p["conv1_w"].shape == (20, 15, 5, 5)
        assert p["conv2_w"].shape == (50, 20, 5, 5)
        assert p["fc1_w"].shape == (500, 7200)
        assert p["fc2_w"].shape == (2, 500)
        # conv1 weights start at offset 0 (30000 bytes per the XML).
        np.testing.assert_array_equal(p["conv1_w"].ravel(), vals[:7500])
        # And the loaded net runs.
        x = np.zeros((2, 60, 60, 15), np.uint8)
        out = lenet.forward({k: jnp.asarray(v) for k, v in p.items()},
                            jnp.asarray(x))
        assert out.shape == (2, 2)
