"""Unit tests for the auto-K selection in the relay-safe timing protocol.

The probe difference (T(96)-T(16))/80 lives in the noise-dominated regime the
protocol exists to escape (RESULTS.md "Measurement protocol"); _pick_k must
survive dispatch hiccups without producing pathological loop lengths.
"""

from rnet.utils.timing import _pick_k


def test_pick_k_normal_case():
    # 1 ms/step + 0.2 s constant: T(16)=0.216, T(96)=0.296
    k1, k2 = _pick_k(0.216, 0.296, target_s=2.0)
    assert k2 == 2000  # target_s / 1e-3
    assert k1 == k2 // 5


def test_pick_k_negative_difference_falls_back_to_upper_bound():
    # hiccup inflated T(16) beyond T(96): difference negative
    k1, k2 = _pick_k(0.5, 0.29, target_s=2.0)
    assert 64 <= k2 <= 50_000
    # fallback est = 0.29/96 -> k2 = 2.0/est
    assert k2 == int(2.0 / (0.29 / 96))


def test_pick_k_absurdly_small_difference_is_capped():
    # near-zero difference would pick a huge K; cap bounds probe cost
    k1, k2 = _pick_k(0.2950, 0.2950001, target_s=2.0)
    assert k2 <= 50_000


def test_pick_k_difference_above_upper_bound_falls_back():
    # est > T(96)/96 is impossible physically -> hiccup in T(16)
    ta, tb = 0.01, 0.96  # est=(0.95)/80 = 11.9ms > ub=10ms
    k1, k2 = _pick_k(ta, tb, target_s=2.0)
    assert k2 == int(2.0 / (tb / 96))


def test_pick_k_floor():
    # very slow steps still measure at least 64 steps
    k1, k2 = _pick_k(1.0, 9.0, target_s=2.0)  # 100 ms/step
    assert k2 == 64
    assert k1 >= 1
