"""Encoder-side MA learning: native helpers vs the Python oracles."""

import numpy as np
import pytest


def test_wp_forward_native_matches_python():
    """The native forward-WP pass (hostcodec.cpp wp_forward) must match
    the Python oracle exactly — prediction and property planes."""
    from jxl_coder_tpu.modular import learn
    import jxl_coder_tpu.native as nm
    if nm.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for shape in ((1, 1), (3, 1), (1, 5), (37, 53), (64, 64)):
        D = rng.integers(-30000, 30000, shape).astype(np.int64)
        native = learn.wp_planes(D)
        real_get = nm.get_lib
        nm.get_lib = lambda: None
        try:
            py = learn.wp_planes(D)
        finally:
            nm.get_lib = real_get
        assert np.array_equal(native[0], py[0]), shape
        assert np.array_equal(native[1], py[1]), shape
