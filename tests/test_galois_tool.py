"""GaloisTool exact-value ports (native/tests/seal/util/galois.cpp:
EltFromStep, EltsFromSteps, EltsAll, IndexFromElt, ApplyGalois,
ApplyGaloisNTT) and the Plaintext polynomial-hex-string conversions
(reference uint64tostring/stringtouint64 + plaintext.cpp hex roundtrips)."""

import numpy as np
import pytest

from seal_tpu.dtypes import Plaintext
from seal_tpu.ops import limb, modring
from seal_tpu.ops.galois import GaloisTool


def test_elt_from_step():
    gt = GaloisTool(3)
    assert gt.get_elt_from_step(0) == 15
    assert gt.get_elt_from_step(1) == 3
    assert gt.get_elt_from_step(-3) == 3
    assert gt.get_elt_from_step(2) == 9
    assert gt.get_elt_from_step(-2) == 9
    assert gt.get_elt_from_step(3) == 11
    assert gt.get_elt_from_step(-1) == 11


def test_elts_from_steps():
    gt = GaloisTool(3)
    assert gt.get_elts_from_steps([0, 1, -3, 2, -2, 3, -1]) == \
        [15, 3, 3, 9, 9, 11, 11]


def test_elts_all():
    assert GaloisTool(3).get_elts_all() == [15, 3, 11, 9, 9]


def test_index_from_elt():
    assert GaloisTool.get_index_from_elt(15) == 7
    assert GaloisTool.get_index_from_elt(3) == 1
    assert GaloisTool.get_index_from_elt(9) == 4
    assert GaloisTool.get_index_from_elt(11) == 5


def test_apply_galois_coeff_domain():
    gt = GaloisTool(3)
    mc = modring.make_mod_consts([17])
    x = limb.arr_to_u64([0, 1, 2, 3, 4, 5, 6, 7], shape=(1, 8))
    out = gt.apply_galois(x, 3, mc)
    lo = np.asarray(out[0])[0]
    assert lo.tolist() == [0, 14, 6, 1, 13, 7, 2, 12]
    assert not np.asarray(out[1]).any()


def test_apply_galois_ntt_domain():
    gt = GaloisTool(3)
    x = limb.arr_to_u64([0, 1, 2, 3, 4, 5, 6, 7], shape=(1, 8))
    out = gt.apply_galois_ntt(x, 3)
    assert np.asarray(out[0])[0].tolist() == [4, 5, 7, 6, 1, 0, 2, 3]


def test_step_too_large_raises():
    gt = GaloisTool(3)
    with pytest.raises(ValueError):
        gt.get_elt_from_step(4)  # >= n/2


# -- Plaintext hex-string conversions ---------------------------------------


def test_hex_roundtrip():
    for s in ["0", "1", "A", "1x^1", "3x^2 + 1x^1 + 2",
              "1Ax^10 + Fx^3 + 1"]:
        assert Plaintext.from_hex_string(s).to_hex_string() == s


def test_hex_parse_values():
    p = Plaintext.from_hex_string("1Ax^10 + Fx^3 + 1")
    assert p.coeff_count == 11
    assert int(p.data[10]) == 0x1A
    assert int(p.data[3]) == 0xF
    assert int(p.data[0]) == 1
    assert p.significant_coeff_count() == 11


def test_hex_zero_and_empty():
    assert Plaintext.from_hex_string("0").to_hex_string() == "0"
    assert Plaintext.from_hex_string("").to_hex_string() == "0"
    assert Plaintext(4).to_hex_string() == "0"


def test_hex_invalid_raises():
    with pytest.raises(ValueError):
        Plaintext.from_hex_string("Gx^2")


def test_plaintext_equality_ignores_trailing_zeros():
    a = Plaintext.from_hex_string("3x^2 + 1")
    b = Plaintext(8)
    b.data[2] = 3
    b.data[0] = 1
    assert a == b
