"""Unit tests for the submap manager: expand rule + decision predicates.

The expand rule is property-tested (SURVEY.md §7 "hard parts"): the
result must always contain the old AABB, respect per-axis max lengths,
and cover the keyframe surface whenever allowed by the clamp.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mipsfusion_tpu.slam import manager as mgr
from mipsfusion_tpu.slam import state as slam_state


# ---------------------------------------------------------------------------
# expand_rule properties
# ---------------------------------------------------------------------------

def random_case(rng):
    center = rng.uniform(-3, 3, 3)
    length = rng.uniform(0.5, 6.0, 3)
    kf_center = center + rng.uniform(-3, 3, 3)
    kf_len = rng.uniform(0.5, 5.0, 3)
    max_len = rng.uniform(4.0, 8.0, 3)
    return center, length, kf_center, kf_len, max_len


@pytest.mark.parametrize("seed", range(20))
def test_expand_rule_properties(seed):
    rng = np.random.default_rng(seed)
    center, length, kf_center, kf_len, max_len = random_case(rng)
    new_c, new_l = mgr.expand_rule(center, length, kf_center, kf_len,
                                   max_len)

    old_lo, old_hi = center - length / 2, center + length / 2
    new_lo, new_hi = new_c - new_l / 2, new_c + new_l / 2

    # never shrinks
    assert (new_lo <= old_lo + 1e-5).all()
    assert (new_hi >= old_hi - 1e-5).all()
    # never exceeds max_len on axes that were under it
    under = length < max_len
    assert (new_l[under] <= max_len[under] + 1e-4).all()
    # axes already over max stay put
    over = ~under
    np.testing.assert_allclose(new_l[over], length[over], atol=1e-5)


def test_expand_rule_contained_noop():
    c, l = np.zeros(3), np.array([4.0, 4.0, 4.0])
    kc, kl = np.array([0.5, 0.0, 0.0]), np.array([1.0, 1.0, 1.0])
    nc, nl = mgr.expand_rule(c, l, kc, kl, np.array([7.0, 7.0, 7.0]))
    np.testing.assert_allclose(nc, c)
    np.testing.assert_allclose(nl, l)


def test_expand_rule_simple_growth():
    c, l = np.zeros(3), np.array([2.0, 2.0, 2.0])
    kc, kl = np.array([2.0, 0.0, 0.0]), np.array([2.0, 1.0, 1.0])
    nc, nl = mgr.expand_rule(c, l, kc, kl, np.array([7.0, 7.0, 7.0]))
    # union on x: [-1, 3]
    assert abs(nl[0] - 4.0) < 1e-5 and abs(nc[0] - 1.0) < 1e-5
    assert abs(nl[1] - 2.0) < 1e-5  # y unchanged (kf inside)


def test_expand_rule_clamped_single_direction():
    c, l = np.zeros(3), np.array([6.0, 2.0, 2.0])
    kc = np.array([5.0, 0.0, 0.0])
    kl = np.array([4.0, 1.0, 1.0])     # union x: [-3, 7], len 10 > max 7
    nc, nl = mgr.expand_rule(c, l, kc, kl, np.array([7.0, 7.0, 7.0]))
    assert abs(nl[0] - 7.0) < 1e-5
    # only positive side needed: hi moves from 3 to 4 (budget 1)
    assert abs((nc[0] + nl[0] / 2) - 4.0) < 1e-5
    assert abs((nc[0] - nl[0] / 2) - (-3.0 + 0.0)) > -1  # lo unchanged at -3
    assert abs((nc[0] - nl[0] / 2) - (-3.0)) < 1e-5


# ---------------------------------------------------------------------------
# containing ratio
# ---------------------------------------------------------------------------

def test_containing_ratio_full_and_empty():
    H, W = 12, 16
    depth = jnp.full((H, W), 2.0)
    dirs = jnp.stack([jnp.zeros((H, W)), jnp.zeros((H, W)),
                      -jnp.ones((H, W))], axis=-1)
    pose = jnp.eye(4)
    rows, cols = mgr.uniform_grid(H, W, 6, 8)
    # all points at z=-2; bbox centered there contains everything
    cr = mgr.containing_ratio(depth, dirs, pose,
                              jnp.asarray([0.0, 0.0, -2.0]),
                              jnp.asarray([1.0, 1.0, 1.0]),
                              jnp.asarray([0.1, 0.1, 0.1]), rows, cols)
    assert float(cr) == 1.0
    cr0 = mgr.containing_ratio(depth, dirs, pose,
                               jnp.asarray([5.0, 5.0, 5.0]),
                               jnp.asarray([1.0, 1.0, 1.0]),
                               jnp.asarray([0.1, 0.1, 0.1]), rows, cols)
    assert float(cr0) == 0.0


def test_min_len_floor_applied():
    H, W = 8, 8
    depth = jnp.full((H, W), 2.0)
    dirs = jnp.stack([jnp.zeros((H, W)), jnp.zeros((H, W)),
                      -jnp.ones((H, W))], axis=-1)
    pose = jnp.eye(4)
    rows, cols = mgr.uniform_grid(H, W, 4, 4)
    # tiny declared length but floor makes it contain the points
    cr = mgr.containing_ratio(depth, dirs, pose,
                              jnp.asarray([0.0, 0.0, -2.0]),
                              jnp.asarray([0.01, 0.01, 0.01]),
                              jnp.asarray([5.0, 5.0, 5.0]), rows, cols)
    assert float(cr) == 1.0


# ---------------------------------------------------------------------------
# decision engine on scripted states
# ---------------------------------------------------------------------------

def make_manager(H=12, W=16):
    cfg = mgr.ManagerConfig(min_containing_ratio=0.7,
                            min_containing_ratio_mo=0.6,
                            min_containing_ratio_back=0.5,
                            min_cr_localMLP_len=(0.1, 0.1, 0.1),
                            localMLP_max_len=(4.0, 4.0, 4.0),
                            localMLP_max_len_back=(4.0, 4.0, 4.0),
                            near=0.0, far=10.0)
    return mgr.Manager(cfg, H, W, keyframe_every=5)


def flat_scene(H=12, W=16, depth_val=2.0):
    # slight per-pixel depth variation so the surface bbox has interior
    # volume (pts_in_bbox is strict, matching the reference)
    jj, ii = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    depth = depth_val + 0.05 * (jj + ii) / (H + W)
    x = (ii - W / 2) / W * 0.4
    y = (jj - H / 2) / H * 0.4
    dirs = jnp.stack([x, y, -jnp.ones((H, W))], axis=-1)
    return depth.astype(jnp.float32), dirs.astype(jnp.float32)


def init_state_with_submap0(center, length, H=12, W=16):
    cap = slam_state.StateCapacity(n_frames=100, n_keyframes=20,
                                   n_submaps=4, rays_per_kf=16,
                                   kf_rays_h=4, kf_rays_w=4)
    st = slam_state.init_state(cap, [4.0, 4.0, 4.0])
    st = st._replace(
        localMLP_info=st.localMLP_info.at[0].set(
            jnp.concatenate([jnp.ones(1), jnp.asarray(center),
                             jnp.asarray(length)])),
        localMLP_first_kf=st.localMLP_first_kf.at[0].set(0),
        keyframe_localMLP=st.keyframe_localMLP.at[0, 0].set(0),
        keyframe_ref=st.keyframe_ref.at[0].set(-1),
        n_kf=jnp.asarray(1, jnp.int32),
    )
    return st


def test_case_contained_binds_msg2():
    m = make_manager()
    depth, dirs = flat_scene()
    st = init_state_with_submap0([0.0, 0.0, -2.0], [3.0, 3.0, 3.0])
    st2, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                   frame_id=5, kf_id=1)
    assert flag == 2
    assert int(st2.active_submap_id) == 0
    assert int(st2.keyframe_localMLP[1, 0]) == 0


def test_case_new_submap_msg3():
    m = make_manager()
    depth, dirs = flat_scene()
    # active submap is far away: surface not contained, no other submap
    st = init_state_with_submap0([10.0, 10.0, 10.0], [1.0, 1.0, 1.0])
    st2, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                   frame_id=5, kf_id=1)
    assert flag == 3
    assert int(st2.active_submap_id) == 1
    assert int(st2.localMLP_first_kf[1]) == 1
    assert int(st2.keyframe_ref[1]) == -1
    # new submap adjacency recorded
    assert float(st2.localMLP_adjacent[0, 1]) == 1.0
    # local pose of the new first keyframe reset to identity
    np.testing.assert_allclose(np.asarray(st2.est_c2w[5]), np.eye(4),
                               atol=1e-6)


def test_case_expand_binds_msg2():
    m = make_manager()
    depth, dirs = flat_scene(depth_val=2.0)
    # submap slightly offset: contains after expansion
    st = init_state_with_submap0([0.0, 0.0, -0.8], [1.2, 1.2, 1.6])
    st2, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                   frame_id=5, kf_id=1)
    assert flag == 2
    # AABB grew to cover the surface at z=-2
    info = np.asarray(st2.localMLP_info[0])
    lo_z = info[3] - info[6] / 2
    assert lo_z <= -2.0 + 1e-4


# ---------------------------------------------------------------------------
# wait-loop and double-binding control paths (ref Manager.py:43-85,
# :460-518) on scripted states — the loop-closure ARMING mechanisms
# ---------------------------------------------------------------------------

def init_state_two_submaps(c0, l0, c1, l1):
    """Submap 0 (previous, first_kf 0) + submap 1 (active, first_kf 1),
    both anchored at identity."""
    cap = slam_state.StateCapacity(n_frames=100, n_keyframes=20,
                                   n_submaps=4, rays_per_kf=16,
                                   kf_rays_h=4, kf_rays_w=4)
    st = slam_state.init_state(cap, [4.0, 4.0, 4.0])
    row0 = jnp.concatenate([jnp.ones(1), jnp.asarray(c0, jnp.float32),
                            jnp.asarray(l0, jnp.float32)])
    row1 = jnp.concatenate([jnp.ones(1), jnp.asarray(c1, jnp.float32),
                            jnp.asarray(l1, jnp.float32)])
    st = st._replace(
        localMLP_info=st.localMLP_info.at[0].set(row0).at[1].set(row1),
        localMLP_first_kf=st.localMLP_first_kf.at[0].set(0).at[1].set(1),
        keyframe_localMLP=st.keyframe_localMLP
        .at[0, 0].set(0).at[1, 0].set(1),
        keyframe_ref=st.keyframe_ref.at[0].set(-1).at[1].set(-1),
        active_submap_id=jnp.asarray(1, jnp.int32),
        active_first_kf=jnp.asarray(1, jnp.int32),
        n_kf=jnp.asarray(2, jnp.int32),
    )
    return st


class OverlapSpy:
    """Scriptable stand-in for the system-installed find_overlap_fn."""

    def __init__(self, results):
        self.results = list(results)
        self.calls = []

    def __call__(self, mo_id, active_id, *a):
        self.calls.append((int(mo_id), int(active_id)))
        ok = self.results.pop(0) if self.results else True
        return (ok, {"top_kf_ids": [0]} if ok else None)


def case5_setup():
    """Camera surface sits in submap 0; active submap 1 is far away and
    already at max_len (cannot expand) -> case 5 fires."""
    m = make_manager()
    depth, dirs = flat_scene()
    st = init_state_two_submaps([0.0, 0.0, -2.0], [3.0, 3.0, 3.0],
                                [10.0, 10.0, 10.0], [4.0, 4.0, 4.0])
    return m, depth, dirs, st


def test_case5_2_arms_wait_loop_then_matures_to_switch():
    """Case 5.2: failed overlap verify -> msg3 + wait-loop armed; the
    next keyframe with cr_wait high and a passing verify -> msg1 switch
    to the waited submap (ref Manager.py:460-489, :494-518)."""
    m, depth, dirs, st = case5_setup()
    spy = OverlapSpy([False, True])
    m.find_overlap_fn = spy

    st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                  frame_id=10, kf_id=2)
    assert flag == 3                       # msg3: new submap created
    assert m.wait_loop is True
    assert m.localMLP_Id_wait == 0         # waiting on the old submap
    assert m.localMLP_Id_actual == 2       # the newly created one
    assert int(st.active_submap_id) == 2
    assert spy.calls == [(0, 1)]           # verify attempted once

    # loop matures: same view again, verify now passes
    st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                  frame_id=15, kf_id=3)
    assert flag == 1                       # msg1 with switch
    assert m.wait_loop is False
    assert int(st.active_submap_id) == 0   # switched back to the waited map
    assert spy.calls[-1] == (0, 2)         # verified against (wait, actual)
    # the loop keyframe is bound to both submaps, waited map first
    assert int(st.keyframe_localMLP[3, 0]) == 0
    assert int(st.keyframe_localMLP[3, 1]) == 2
    assert int(st.keyframe_ref[3]) == -2
    assert m.ovlp_data is not None


def test_wait_loop_holds_while_cr_drops():
    """cr_wait below threshold -> normal processing; the wait state is
    NOT discarded (ref :502-504 falls through without reset) and a later
    re-entry can still mature it."""
    m, depth, dirs, st = case5_setup()
    spy = OverlapSpy([False, True])
    m.find_overlap_fn = spy
    st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                  frame_id=10, kf_id=2)
    assert flag == 3 and m.wait_loop

    # camera moved away from the waited submap: surface now far from
    # submap 0 (translate along +x by 8 in the NEW active submap's
    # local frame whose anchor is the case-5.2 keyframe's world pose)
    away = jnp.eye(4).at[0, 3].set(8.0)
    st, flag = m.process_keyframe(st, depth, dirs, away,
                                  frame_id=15, kf_id=3)
    # fell through to the normal path (no switch); wait state retained
    assert flag in (2, 3)
    assert len(spy.calls) == 1             # verify NOT attempted
    if flag == 2:
        assert m.wait_loop is True

    # re-entry at the original view -> the wait loop can still mature
    if m.wait_loop:
        st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                      frame_id=20, kf_id=4)
        assert flag == 1
        assert m.wait_loop is False
        assert int(st.active_submap_id) == 0


def test_wait_loop_cleared_by_new_submap():
    """A msg3 on the normal path resets the wait state (ref :442,453)."""
    m, depth, dirs, st = case5_setup()
    m.find_overlap_fn = OverlapSpy([False, False, False, False])
    st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                  frame_id=10, kf_id=2)
    assert flag == 3 and m.wait_loop
    # move far from BOTH submaps: cr_wait < back, then case 3 (mo==active
    # impossible here — submap 0 still scores; go far enough that no
    # submap contains the surface and the most-overlapping cr < back)
    away = jnp.eye(4).at[0, 3].set(30.0).at[1, 3].set(30.0)
    st, flag = m.process_keyframe(st, depth, dirs, away,
                                  frame_id=15, kf_id=3)
    assert flag == 3
    assert m.wait_loop is False


def test_double_binding_forces_verified_switch():
    """>= thres_db_time consecutive same-pair double bindings force a
    verify; a passing verify switches (ref process_double_binding
    :63-85). Counter: kf N arms the pair, kfs N+1..N+3 accumulate to 4,
    kf N+4 triggers the forced attempt."""
    m = make_manager()
    depth, dirs = flat_scene()
    # both submaps contain the surface: case 1 with double binding
    st = init_state_two_submaps([0.0, 0.0, -2.0], [3.0, 3.0, 3.0],
                                [0.1, 0.0, -2.0], [3.2, 3.2, 3.2])
    spy = OverlapSpy([True])
    m.find_overlap_fn = spy

    flags = []
    for k in range(2, 8):
        st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                      frame_id=5 * k, kf_id=k)
        flags.append(flag)
        if flag == 1:
            break
    # four accumulating msg1 binds (flag 2... wait: msg1 without switch
    # returns 2) then the forced verified switch returns 1
    assert flags[-1] == 1
    assert len(flags) == 5                 # counter 1,2,3,4 -> trigger
    assert spy.calls == [(0, 1)]           # exactly one forced verify
    assert m.double_binding_counter == 0   # reset after the trigger
    assert int(st.active_submap_id) == 0   # switched to the mo submap


def test_double_binding_failed_verify_resets_counter():
    """A failed forced verify resets the counter to 0 (the reference's
    20230816 modification, ref Manager.py:76-79) — no immediate retry."""
    m = make_manager()
    depth, dirs = flat_scene()
    st = init_state_two_submaps([0.0, 0.0, -2.0], [3.0, 3.0, 3.0],
                                [0.1, 0.0, -2.0], [3.2, 3.2, 3.2])
    spy = OverlapSpy([False, False])
    m.find_overlap_fn = spy

    flags = []
    for k in range(2, 13):
        st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                      frame_id=5 * k, kf_id=k)
        flags.append(flag)
    assert all(f == 2 for f in flags)      # never switched
    # forced verify attempted on the 5th and 10th same-pair bind
    assert spy.calls == [(0, 1), (0, 1)]
    assert int(st.active_submap_id) == 1


def test_double_binding_pair_change_resets_counter():
    """Binding a different pair resets the counter (ref :81-84)."""
    m = make_manager()
    depth, dirs = flat_scene()
    st = init_state_two_submaps([0.0, 0.0, -2.0], [3.0, 3.0, 3.0],
                                [0.1, 0.0, -2.0], [3.2, 3.2, 3.2])
    spy = OverlapSpy([True])
    m.find_overlap_fn = spy
    for k in range(2, 5):
        st, _ = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                   frame_id=5 * k, kf_id=k)
    assert m.double_binding_counter == 3
    # simulate a pair change by binding with a different active submap
    m.db_active_id = 99
    st, flag = m.process_keyframe(st, depth, dirs, jnp.eye(4),
                                  frame_id=25, kf_id=5)
    assert flag == 2
    assert m.double_binding_counter == 0   # reset, re-armed next bind
    assert spy.calls == []                 # no verify attempted
