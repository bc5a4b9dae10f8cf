"""Fiat-Shamir transcript + hash-to-field bit-exactness tests."""

import hashlib

import pytest

from snark_bn254_verifier_tpu.utils import errors
from snark_bn254_verifier_tpu.utils.hash_to_field import (
    WrappedHashToField,
    expand_msg_xmd,
    hash_to_field_bytes,
)
from snark_bn254_verifier_tpu.utils.transcript import Transcript

pytestmark = pytest.mark.smoke  # host-only: sub-2-minute iteration tier


def test_first_challenge_is_name_plus_bindings():
    t = Transcript(["gamma", "beta"])
    t.bind("gamma", b"hello")
    t.bind("gamma", b"world")
    got = t.compute_challenge("gamma")
    assert got == hashlib.sha256(b"gamma" + b"hello" + b"world").digest()


def test_chained_challenge_includes_previous():
    t = Transcript(["gamma", "beta"])
    t.bind("gamma", b"x")
    g = t.compute_challenge("gamma")
    b = t.compute_challenge("beta")
    assert b == hashlib.sha256(b"beta" + g).digest()


def test_challenge_memoized():
    t = Transcript(["gamma"])
    t.bind("gamma", b"x")
    assert t.compute_challenge("gamma") == t.compute_challenge("gamma")


def test_out_of_order_rejected():
    t = Transcript(["gamma", "beta"])
    with pytest.raises(errors.PreviousChallengeNotComputedError):
        t.compute_challenge("beta")


def test_bind_after_compute_rejected():
    t = Transcript(["gamma"])
    t.compute_challenge("gamma")
    with pytest.raises(errors.ChallengeAlreadyComputedError):
        t.bind("gamma", b"x")


def test_unknown_challenge_rejected():
    t = Transcript(["gamma"])
    with pytest.raises(errors.ChallengeNotFoundError):
        t.bind("nope", b"x")


def test_expand_msg_xmd_structure():
    """Recompute the RFC-9380 construction by hand for len=48."""
    msg, dst, ln = b"msg", b"BSB22-Plonk", 48
    dst_prime = dst + bytes([len(dst)])
    b0 = hashlib.sha256(b"\x00" * 64 + msg + bytes([0, 48, 0]) + dst_prime).digest()
    b1 = hashlib.sha256(b0 + b"\x01" + dst_prime).digest()
    b2 = hashlib.sha256(
        bytes(x ^ y for x, y in zip(b0, b1)) + b"\x02" + dst_prime
    ).digest()
    assert expand_msg_xmd(msg, dst, ln) == (b1 + b2)[:48]


def test_hash_to_field_elements_are_48_bytes():
    out = hash_to_field_bytes(b"abc", b"BSB22-Plonk", 3)
    assert len(out) == 3 and all(len(o) == 48 for o in out)


def test_wrapped_hasher_accumulates():
    h = WrappedHashToField(b"BSB22-Plonk")
    h.write(b"ab")
    h.write(b"cd")
    direct = hash_to_field_bytes(b"abcd", b"BSB22-Plonk", 1)[0]
    assert h.sum() == direct
    h.reset()
    h.write(b"abcd")
    assert h.sum() == direct
