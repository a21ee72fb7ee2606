"""Differential test: the on-device greedy scan (_greedy_scan_device via
_greedy_search) must reproduce a straightforward host transliteration of the
reference's subsearch loop (MDAFunctions.py:39-192 insertion /
:313-511 deletion skeleton) pick-for-pick — including the shrinking tail
window, the skip seeding, and the cutoff early-exit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_models import tiny_bundle

HW = 32


def _host_greedy(bundle, start, finish, seg_map, order, n_steps, target,
                 direction, skip=None, n_searches=None, cutoff=None,
                 norm_pair=None):
    """The round-2 host loop, kept verbatim as the semantic oracle."""
    n_searches = n_searches or n_steps
    chosen_set = set(skip or [])
    picked, responses = [], []
    subsearch = min(int(n_steps ** 0.5) * 2, 28)
    seg = np.asarray(seg_map)
    start = np.asarray(start).copy()
    finish = np.asarray(finish)

    def available(k):
        out = []
        for s in order:
            if s not in chosen_set:
                out.append(s)
                if len(out) == k:
                    break
        return out

    main_rounds = n_searches - subsearch - (len(skip) if skip else 0)
    tail = subsearch
    if skip and len(skip) > n_searches - subsearch:
        tail = n_searches - len(skip)
    total_rounds = max(main_rounds, 0) + tail
    for r in range(total_rounds):
        k = subsearch if r < max(main_rounds, 0) else \
            tail - (r - max(main_rounds, 0))
        if k <= 0:
            break
        cands = available(k)
        if not cands:
            break
        scores = []
        for cid in cands:
            img = np.where((seg == cid)[..., None], finish, start)
            p = jax.nn.softmax(bundle.apply(
                bundle.params, jnp.asarray(img)[None])[0].astype(
                    jnp.float32))[target]
            scores.append(float(p))
        idx = int(np.argmax(scores)) if direction == "max" else \
            int(np.argmin(scores))
        seg_id = cands[idx]
        resp = scores[idx]
        picked.append(seg_id)
        responses.append(resp)
        chosen_set.add(seg_id)
        start = np.where((seg == seg_id)[..., None], finish, start)
        if cutoff is not None and norm_pair is not None and cutoff != 1:
            orig, base = norm_pair
            if (resp - base) / abs(orig - base) >= cutoff:
                responses[-1] = cutoff
                return picked, responses, True
    return picked, responses, False


@pytest.fixture(scope="module")
def setup():
    b = tiny_bundle(hw=HW)
    rs = np.random.RandomState(3)
    x = rs.randn(HW, HW, 3).astype(np.float32)
    start = np.zeros_like(x)
    # 16 rectangular segments
    seg = np.zeros((HW, HW), np.int32)
    for i in range(4):
        for j in range(4):
            seg[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = i * 4 + j
    order = list(rs.permutation(16))
    return b, start, x, seg, order


@pytest.mark.parametrize("case", ["ins_cutoff", "ins_nocut", "del_skip",
                                  "del_bigskip"])
def test_scan_matches_host_loop(setup, case):
    from xai_tpu.methods.mda import _greedy_search

    b, start, x, seg, order = setup
    n = 16
    target = 3
    kw = dict(n_searches=n)
    if case == "ins_cutoff":
        # a low cutoff that the tiny model's response will cross early
        kw.update(direction="max", cutoff=0.05, norm_pair=(1.0, 0.0))
    elif case == "ins_nocut":
        kw.update(direction="max", cutoff=1, norm_pair=(1.0, 0.0))
    elif case == "del_skip":
        kw.update(direction="min", skip=order[:5])
    else:
        # skip > n_searches - subsearch exercises the shrunken tail window
        kw.update(direction="min", skip=order[:12])

    want_p, want_r, want_e = _host_greedy(b, start, x, seg, order, n,
                                          target, **kw)
    got_p, got_r, _, got_e = _greedy_search(b, start, x, seg, order, n,
                                            target, **kw)
    assert got_p == want_p, (case, got_p, want_p)
    assert got_e == want_e, case
    np.testing.assert_allclose(got_r, want_r, rtol=1e-5, atol=1e-6,
                               err_msg=case)


@pytest.mark.parametrize("case", ["ins", "del"])
def test_scan_bf16_rank_stable(setup, case):
    """--attr_dtype bf16 promise for MDA (VERDICT r4 #4a), formalized.

    bf16 cannot resolve candidate-response gaps below its epsilon, so
    demanding a pick-for-pick match with f32 would only test whether the
    tiny model happens to avoid near-ties (it doesn't: deep in the
    shrinking tail the remaining segments barely move the softmax).  The
    real stability contract is two-part:

    1. every bf16 pick is ε-OPTIMAL under f32 scoring — at the bf16 run's
       own state, the f32 response of the picked segment is within a bf16-
       noise band of the f32-best candidate (bf16 may only ever swap
       near-ties, never pick a genuinely worse segment);
    2. the main-window picks (where the response gaps are macroscopic)
       match f32 exactly.
    """
    from xai_tpu.methods.mda import _greedy_search

    b, start, x, seg, order = setup
    n = 16
    target = 3
    skip = None
    kw = dict(n_searches=n)
    if case == "ins":
        kw.update(direction="max", cutoff=1, norm_pair=(1.0, 0.0))
    else:
        skip = order[:5]
        kw.update(direction="min", skip=skip)
    direction = kw["direction"]

    f32_p, _, _, _ = _greedy_search(b, start, x, seg, order, n, target, **kw)
    bf_p, _, _, _ = _greedy_search(b, start, x, seg, order, n, target,
                                   dtype=jnp.bfloat16, **kw)
    assert len(bf_p) == len(f32_p), (case, bf_p, f32_p)

    # exact match over the main (full-window) rounds
    subsearch = min(int(n ** 0.5) * 2, 28)
    main_rounds = max(n - subsearch - (len(skip) if skip else 0), 0)
    assert bf_p[:main_rounds] == f32_p[:main_rounds], (case, bf_p, f32_p)

    # ε-optimality of every bf16 pick, replayed under f32 scoring
    segnp = np.asarray(seg)
    chosen = set(skip or [])
    cur = np.asarray(start).copy()
    finish = np.asarray(x)
    eps = 0.02

    def f32_score(cid):
        img = np.where((segnp == cid)[..., None], finish, cur)
        p = jax.nn.softmax(b.apply(b.params, jnp.asarray(img)[None])[0]
                           .astype(jnp.float32))[target]
        return float(p)

    tail = subsearch if not (skip and len(skip) > n - subsearch) \
        else n - len(skip)
    for r, pick in enumerate(bf_p):
        k = subsearch if r < main_rounds else tail - (r - main_rounds)
        cands = [s for s in order if s not in chosen][:k]
        assert pick in cands, (case, r, pick, cands)
        scores = {c: f32_score(c) for c in cands}
        best = max(scores.values()) if direction == "max" \
            else min(scores.values())
        assert abs(scores[pick] - best) <= eps, \
            (case, r, pick, scores[pick], best)
        chosen.add(pick)
        cur = np.where((segnp == pick)[..., None], finish, cur)
