"""Fixed-size random/pseudo/OHEM sampling over padded candidate sets.

TPU-native equivalent of the reference's samplers
(mmdet/core/bbox/samplers/): instead of variable-length index tensors,
sampling produces either boolean selection masks (anchor heads) or
fixed-length index arrays with validity masks (RoI heads), so shapes
stay static under jit.  Randomness is explicit jax.random keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def random_topk_mask(key: jax.Array, mask: jax.Array, k,
                     k_max: int | None = None) -> jax.Array:
    """Uniformly select up to ``k`` True entries of ``mask`` (k may be a
    traced scalar), returned as a boolean mask.

    ``k_max``: static upper bound on k.  When given, selection runs as
    a bounded ``lax.top_k`` + threshold instead of a full argsort +
    rank scatter — at RPN anchor counts (~262k, the anchor_target hot
    path) the full sort/scatter pair is the single most expensive op
    in the train step's target stage.  Exact for the tie-free random
    keys used here (ties have measure zero).
    """
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    score = jnp.where(mask, r, -1.0)
    if k_max is not None:
        k_max = min(int(k_max), n)
        vals = jax.lax.top_k(score, k_max)[0]          # descending
        kc = jnp.clip(k, 0, k_max)
        thr = jnp.where(kc > 0,
                        vals[jnp.maximum(kc - 1, 0)], jnp.inf)
        # score >= thr keeps exactly kc masked entries (thr = -1.0 when
        # fewer candidates than kc exist → the whole mask is kept)
        return mask & (score >= thr)
    order = jnp.argsort(-score)
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return mask & (rank < k)


def topk_mask_by_score(mask: jax.Array, score: jax.Array, k) -> jax.Array:
    """Select up to ``k`` True entries of ``mask`` with the highest
    ``score`` (hard-example mining; OHEMSampler equivalent,
    mmdet/core/bbox/samplers/ohem_sampler.py)."""
    n = mask.shape[0]
    s = jnp.where(mask, score, -jnp.inf)
    order = jnp.argsort(-s)
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return mask & (rank < k)


class SampleMasks(NamedTuple):
    pos: jax.Array       # [N] bool — selected positives
    neg: jax.Array       # [N] bool — selected negatives
    num_pos: jax.Array   # scalar int
    num_neg: jax.Array   # scalar int


def random_sample_masks(key: jax.Array, assigned: jax.Array,
                        num: int, pos_fraction: float,
                        neg_pos_ub: float = -1.0,
                        neg_score: jax.Array | None = None) -> SampleMasks:
    """Sample positives/negatives as masks over the candidate set.

    Parity: RandomSampler (random_sampler.py:46-66) +
    BaseSampler.sample (base_sampler.py:79-97): up to num*pos_fraction
    positives uniformly, then num - n_pos negatives (optionally capped
    at neg_pos_ub * n_pos), uniformly — or by ``neg_score`` ranking for
    OHEM-on-negatives.

    Args:
      assigned: [N] assignment from :func:`max_iou_assign`.
    """
    kp, kn = jax.random.split(key)
    pos_cand = assigned > 0
    neg_cand = assigned == 0

    num_expected_pos = int(num * pos_fraction)
    pos = random_topk_mask(kp, pos_cand, num_expected_pos,
                           k_max=num_expected_pos)
    num_pos = pos.sum()

    num_expected_neg = num - num_pos
    if neg_pos_ub >= 0:
        ub = (neg_pos_ub * jnp.maximum(num_pos, 1)).astype(jnp.int32)
        num_expected_neg = jnp.minimum(num_expected_neg, ub)
    if neg_score is not None:
        neg = topk_mask_by_score(neg_cand, neg_score, num_expected_neg)
    else:
        neg = random_topk_mask(kn, neg_cand, num_expected_neg, k_max=num)
    return SampleMasks(pos, neg, num_pos, neg.sum())


def pseudo_sample_masks(assigned: jax.Array) -> SampleMasks:
    """Use all positives and all negatives (PseudoSampler,
    mmdet/core/bbox/samplers/pseudo_sampler.py) — for single-stage heads."""
    pos = assigned > 0
    neg = assigned == 0
    return SampleMasks(pos, neg, pos.sum(), neg.sum())


def iou_balanced_neg_masks(key: jax.Array, assigned: jax.Array,
                           max_overlaps: jax.Array, num_neg,
                           floor_thr: float = -1.0,
                           floor_fraction: float = 0.0,
                           num_bins: int = 3,
                           neg_iou_ub: float = 0.5) -> jax.Array:
    """IoU-balanced negative sampling (Libra R-CNN).

    Parity: mmdet/core/bbox/samplers/iou_balanced_neg_sampler.py —
    negatives are drawn evenly from IoU bins over [floor, ub] so hard
    negatives aren't swamped by easy ones.  Returns a [N] bool mask of
    ≤ num_neg selected negatives.
    """
    neg_cand = assigned == 0
    floor = max(floor_thr, 0.0)
    per_bin = (num_neg * (1.0 - floor_fraction) / num_bins)
    keys = jax.random.split(key, num_bins + 1)
    sel = jnp.zeros_like(neg_cand)
    width = (neg_iou_ub - floor) / num_bins
    taken = 0
    for i in range(num_bins):
        lo = floor + i * width
        hi = floor + (i + 1) * width
        in_bin = neg_cand & (max_overlaps >= lo) & (max_overlaps < hi)
        k = jnp.minimum(jnp.int32(per_bin), num_neg)
        sel |= random_topk_mask(keys[i], in_bin, k)
    # fill any shortfall (and the floor set) uniformly from the rest
    shortfall = num_neg - sel.sum()
    rest = neg_cand & ~sel
    sel |= random_topk_mask(keys[-1], rest, shortfall)
    return sel


def instance_balanced_pos_masks(key: jax.Array, assigned: jax.Array,
                                num_pos, num_gts: int) -> jax.Array:
    """Instance-balanced positive sampling.

    Parity: mmdet/core/bbox/samplers/instance_balanced_pos_sampler.py —
    the positive budget is split evenly across gt instances.
    Returns a [N] bool mask.
    """
    pos_cand = assigned > 0
    per_gt = jnp.maximum(num_pos // jnp.maximum(num_gts, 1), 1)
    keys = jax.random.split(key, 2)
    n = assigned.shape[0]
    r = jax.random.uniform(keys[0], (n,))
    # rank positives within their own gt group; keep the first per_gt
    order = jnp.argsort(jnp.where(pos_cand, r, 2.0)
                        + assigned.astype(jnp.float32) * 4.0)
    rank_in_group = jnp.zeros(n, jnp.int32)
    # position within group = running index among same `assigned`
    sorted_assigned = assigned[order]
    same_as_prev = jnp.concatenate(
        [jnp.array([False]), sorted_assigned[1:] == sorted_assigned[:-1]])
    # cumulative position within equal-assignment runs
    idx = jnp.arange(n)
    run_start = jnp.where(~same_as_prev, idx, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    within = idx - run_start
    rank_in_group = rank_in_group.at[order].set(within)
    sel = pos_cand & (rank_in_group < per_gt)
    # fill shortfall uniformly from remaining positives
    shortfall = num_pos - sel.sum()
    sel |= random_topk_mask(keys[1], pos_cand & ~sel, shortfall)
    # never exceed the budget
    r2 = jax.random.uniform(keys[1], (n,))
    return topk_mask_by_score(sel, r2, num_pos)


class FixedSample(NamedTuple):
    """Fixed-length RoI sample for the second stage (length = num)."""
    inds: jax.Array      # [num] int32 indices into the candidate boxes
    is_pos: jax.Array    # [num] bool
    valid: jax.Array     # [num] bool (False → padding slot)
    gt_inds: jax.Array   # [num] int32 0-based assigned gt (-1 for neg/pad)


def sample_fixed(key: jax.Array, assigned: jax.Array, num: int,
                 pos_fraction: float, neg_pos_ub: float = -1.0) -> FixedSample:
    """Fixed-size RoI sampling: positions [0, num*pos_fraction) hold
    positives, the rest negatives; invalid slots are marked, never
    dropped — the static-shape replacement for the reference's
    variable-length SamplingResult (samplers/sampling_result.py)."""
    kp, kn = jax.random.split(key)
    n = assigned.shape[0]
    num_pos_max = int(num * pos_fraction)

    pos = random_topk_mask(kp, assigned > 0, num_pos_max)
    num_pos = pos.sum()
    num_neg = num - num_pos  # scarce positives → more negatives
    if neg_pos_ub >= 0:
        ub = (neg_pos_ub * jnp.maximum(num_pos, 1)).astype(jnp.int32)
        num_neg = jnp.minimum(num_neg, ub)
    neg = random_topk_mask(kn, assigned == 0, num_neg)

    # one unified ordering: selected positives, then selected negatives,
    # then everything else (padding slots)
    big = jnp.float32(n)
    rank = jnp.where(pos, 0.0, jnp.where(neg, 1.0, 2.0)) * big \
        + jnp.arange(n, dtype=jnp.float32)
    order = jnp.argsort(rank)[:num].astype(jnp.int32)
    is_pos = pos[order]
    valid = is_pos | neg[order]
    gt = jnp.where(is_pos, assigned[order] - 1, -1)
    return FixedSample(order, is_pos, valid, gt)


def sample_fixed_combined(key: jax.Array, assigned: jax.Array,
                          max_overlaps: jax.Array, num: int,
                          pos_fraction: float,
                          neg_pos_ub: float = -1.0,
                          pos_sampler: str = "instance_balanced",
                          neg_sampler: str = "iou_balanced",
                          num_gts: int = 256,
                          floor_thr: float = -1.0,
                          floor_fraction: float = 0.0,
                          num_bins: int = 3) -> FixedSample:
    """Fixed-size sampling with separately configured positive and
    negative strategies.

    Parity: CombinedSampler
    (mmdet/core/bbox/samplers/combined_sampler.py) — the reference
    composes a pos_sampler and neg_sampler (the Libra R-CNN config uses
    InstanceBalancedPosSampler + IoUBalancedNegSampler); here each side
    picks its mask strategy and the result packs into the standard
    FixedSample layout.
    """
    kp, kn = jax.random.split(key)
    n = assigned.shape[0]
    num_pos_max = int(num * pos_fraction)

    if pos_sampler == "instance_balanced":
        pos = instance_balanced_pos_masks(kp, assigned, num_pos_max,
                                          num_gts)
    else:
        pos = random_topk_mask(kp, assigned > 0, num_pos_max)
    num_pos = pos.sum()
    num_neg = num - num_pos
    if neg_pos_ub >= 0:
        ub = (neg_pos_ub * jnp.maximum(num_pos, 1)).astype(jnp.int32)
        num_neg = jnp.minimum(num_neg, ub)
    if neg_sampler == "iou_balanced":
        neg = iou_balanced_neg_masks(kn, assigned, max_overlaps, num_neg,
                                     floor_thr=floor_thr,
                                     floor_fraction=floor_fraction,
                                     num_bins=num_bins)
    else:
        neg = random_topk_mask(kn, assigned == 0, num_neg)

    big = jnp.float32(n)
    rank = jnp.where(pos, 0.0, jnp.where(neg, 1.0, 2.0)) * big \
        + jnp.arange(n, dtype=jnp.float32)
    order = jnp.argsort(rank)[:num].astype(jnp.int32)
    is_pos = pos[order]
    valid = is_pos | neg[order]
    gt = jnp.where(is_pos, assigned[order] - 1, -1)
    return FixedSample(order, is_pos, valid, gt)
