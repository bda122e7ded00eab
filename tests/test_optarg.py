# -*- coding: utf-8 -*-
"""Grid-optimal SOR factor bounds (reference tests/test_OptArg.py:13-26)."""
import numpy as np

from xinvert_tpu import optimal_omega


def test_optarg_bounds():
    for ny in range(2, 120, 7):
        for nx in range(2, 120, 11):
            w = optimal_omega((ny, nx))
            assert 1.0 <= w <= 2.0


def test_optarg_formula():
    # reference formula (apps.py:2289-2290) evaluated directly
    gc1, gc2 = 100, 100
    eps = (np.sin(np.pi / (2 * gc2 + 2)) ** 2
           + np.sin(np.pi / (2 * gc1 + 2)) ** 2)
    expect = 2.0 / (1.0 + np.sqrt((2.0 - eps) * eps))
    assert np.isclose(optimal_omega((gc1, gc2)), expect)
    assert 1.0 <= optimal_omega((73,)) <= 2.0
    assert 1.0 <= optimal_omega((37, 72, 288)) <= 2.0
