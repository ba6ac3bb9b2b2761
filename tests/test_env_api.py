"""Environment API contract tests.

Covers the reference's test surface (adcraft/tests/test_env.py:9-69 and
test_gymnasium_kw_utils.py) plus the vector/functional API the reference
lacks.
"""

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from gymnasium.spaces import Dict as DictSpace

from adcraft_tpu import (
    BiddingSimulation,
    EnvConfig,
    KeywordKind,
    VectorBiddingEnv,
    bidding_sim_creator,
)
from adcraft_tpu.quantiles import simple_experiment_table
from adcraft_tpu.spaces import get_action_space, get_observation_space
from adcraft_tpu.wrappers import FlatArrayWrapper


def small_env(**kw):
    return BiddingSimulation(num_keywords=4, max_volume=64, **kw)


def quantile_env(**kw):
    table = simple_experiment_table(32, 0.5)
    return BiddingSimulation(
        keyword_config={"load_quant_func": lambda _cfg: table, "quantiles_folder": "x"},
        num_keywords=4,
        **kw,
    )


@pytest.mark.unit
def test_is_gym_env():
    env = small_env()
    assert isinstance(env, gym.Env)
    assert isinstance(env.observation_space, DictSpace)
    assert isinstance(env.action_space, DictSpace)


@pytest.mark.unit
def test_get_action_space_is_dict():
    assert isinstance(get_action_space(5), DictSpace)
    assert isinstance(get_observation_space(5, 1000.0), DictSpace)


@pytest.mark.unit
@pytest.mark.parametrize("seed", [None, 1])
def test_reset_runs(seed):
    env = small_env()
    obs, info = env.reset(seed=seed)
    assert "keyword_params" in info


@pytest.mark.unit
def test_reset_obs_in_space():
    env = small_env()
    obs, _ = env.reset(seed=1)
    assert env.observation_space.contains(obs)


@pytest.mark.unit
@pytest.mark.parametrize("make", [small_env, quantile_env])
def test_step_obs_in_space(make):
    env = make()
    env.reset(seed=1)
    obs, reward, term, trunc, info = env.step(env.action_space.sample())
    assert env.observation_space.contains(obs)
    assert isinstance(reward, float)
    assert isinstance(term, bool) and isinstance(trunc, bool)
    for k in ("bids", "bidding_outcomes", "keyword_params"):
        assert k in info


@pytest.mark.unit
def test_step_requires_reset():
    env = small_env()
    with pytest.raises(AssertionError):
        env.step(env.action_space.sample())


@pytest.mark.unit
def test_episode_terminates_at_max_days():
    env = quantile_env(max_days=3)
    env.reset(seed=0)
    action = {
        "keyword_bids": np.full(4, 0.5, np.float32),
        "budget": np.asarray([100.0], np.float32),
    }
    for day in range(1, 4):
        obs, r, term, trunc, _ = env.step(action)
        assert obs["days_passed"][0] == day
        assert term == (day == 3)


@pytest.mark.unit
def test_seeded_reset_is_reproducible():
    env1 = quantile_env()
    env2 = quantile_env()
    env1.reset(seed=42)
    env2.reset(seed=42)
    assert env1.keyword_params == env2.keyword_params
    action = {
        "keyword_bids": np.full(4, 1.0, np.float32),
        "budget": np.asarray([500.0], np.float32),
    }
    o1 = env1.step(action)
    o2 = env2.step(action)
    for k in o1[0]:
        np.testing.assert_array_equal(o1[0][k], o2[0][k], err_msg=k)
    assert o1[1] == o2[1]


@pytest.mark.unit
def test_options_override():
    env = small_env()
    env.reset(seed=0, options={"max_days": 5, "loss_threshold": 123.0})
    assert env.max_days == 5
    assert env.loss_threshold == 123.0


@pytest.mark.unit
def test_render_ansi():
    env = small_env(render_mode="ansi")
    env.reset(seed=0)
    assert "New start" in env.render()
    env.step(env.action_space.sample())
    assert "Time step" in env.render()


@pytest.mark.unit
def test_bidding_sim_creator():
    env = bidding_sim_creator({"num_keywords": 3, "max_volume": 32})
    assert env.num_keywords == 3


@pytest.mark.unit
def test_flat_wrapper_round_trip():
    env = FlatArrayWrapper(small_env())
    obs, info = env.reset(seed=0)
    assert obs.ndim == 1
    # 5 per-kw fields * K + cumulative_profit + days_passed
    assert obs.shape == (5 * 4 + 2,)
    flat_action = env.action_space.sample()
    obs, reward, term, trunc, info = env.step(flat_action)
    assert obs.shape == (5 * 4 + 2,)


@pytest.mark.unit
def test_vector_env_steps_batch(key):
    cfg = EnvConfig(
        num_keywords=3, kind=KeywordKind.IMPLICIT, max_volume=64, max_days=4
    )
    table = simple_experiment_table(16, 0.5)
    venv = VectorBiddingEnv(cfg, num_envs=8, table=table)
    state, obs = venv.reset(key)
    assert obs["impressions"].shape == (8, 3)
    bids = jnp.full((8, 3), 1.0)
    state, ts = venv.step(state, bids)
    assert ts.obs["impressions"].shape == (8, 3)
    assert ts.reward.shape == (8,)
    assert np.all(np.asarray(ts.obs["days_passed"]) == 1)
    # budget override path
    state, ts = venv.step(state, bids, jnp.full((8,), 50.0))
    assert np.all(np.asarray(ts.outcomes.cost.sum(axis=1)) <= 50.0 + 1e-4)


@pytest.mark.unit
def test_vector_env_independent_envs(key):
    """Different envs must see different randomness."""
    cfg = EnvConfig(num_keywords=2, kind=KeywordKind.IMPLICIT, max_volume=64)
    table = simple_experiment_table(32, 0.8)
    venv = VectorBiddingEnv(cfg, num_envs=16, table=table)
    state, _ = venv.reset(key)
    vols = np.asarray(state.kw.vol_std)
    assert len(np.unique(vols)) > 1
    state, ts = venv.step(state, jnp.full((16, 2), 1.0))
    assert len(np.unique(np.asarray(ts.reward))) > 1


@pytest.mark.unit
def test_vmap_batch_matches_single_env_bitexact():
    """Each lane of a vmapped batch step must equal the same env stepped
    alone (vmap cannot change trajectories — SURVEY.md §4)."""
    from adcraft_tpu.env import env_reset, env_step

    cfg = EnvConfig(num_keywords=4, kind=KeywordKind.IMPLICIT, max_volume=64)
    table = simple_experiment_table(32, 0.5)
    keys = jax.random.split(jax.random.PRNGKey(42), 3)
    states, _ = jax.vmap(lambda k: env_reset(cfg, k, table=table))(keys)
    bids = jnp.asarray(
        np.random.default_rng(0).uniform(0.2, 2.0, (3, 4)), jnp.float32
    )
    b_state, b_ts = jax.jit(jax.vmap(lambda s, b: env_step(cfg, s, b)))(
        states, bids
    )
    for i in range(3):
        s_i = jax.tree.map(lambda x: x[i], states)
        one_state, one_ts = jax.jit(lambda s, b: env_step(cfg, s, b))(
            s_i, bids[i]
        )
        for a, b in zip(jax.tree.leaves(one_ts), jax.tree.leaves(b_ts)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)[i] if b.ndim else np.asarray(b)
            )
        for a, b in zip(jax.tree.leaves(one_state), jax.tree.leaves(b_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[i])


@pytest.mark.unit
def test_env_autoreset_step_resets_on_done():
    """env_autoreset_step returns the pre-reset transition but a fresh
    state once the episode ends (VERDICT r1: untested export)."""
    import jax
    import jax.numpy as jnp

    from adcraft_tpu.config import EnvConfig, KeywordKind
    from adcraft_tpu.env import env_autoreset_step, env_reset
    from adcraft_tpu.quantiles import simple_experiment_table

    cfg = EnvConfig(
        num_keywords=3, kind=KeywordKind.IMPLICIT, max_volume=48, max_days=2
    )
    table = simple_experiment_table(16, 0.5)
    state, _ = env_reset(cfg, jax.random.PRNGKey(0), table=table)
    bids = jnp.full((3,), 1.0)

    state, ts1 = env_autoreset_step(cfg, state, bids, table=table)
    assert not bool(ts1.terminated | ts1.truncated)
    assert int(state.day) == 1
    kw_before = state.kw
    state, ts2 = env_autoreset_step(cfg, state, bids, table=table)
    # day 2 of a 2-day episode: TimeStep reports the done transition...
    assert bool(ts2.terminated | ts2.truncated)
    # ...but the returned state is already reset (day 0, budget restored)
    assert int(state.day) == 0
    # post-reset invariants: profit cleared, budget restored to config
    assert float(state.cumulative_profit) == 0.0
    assert float(state.budget) == float(cfg.budget)
    # keywords kept by default (reference resamples only on new seed,
    # gymnasium_kw_env.py:303)
    np.testing.assert_array_equal(
        np.asarray(kw_before.vol_mean), np.asarray(state.kw.vol_mean)
    )
    # and the env keeps stepping after the auto-reset
    state, ts3 = env_autoreset_step(cfg, state, bids, table=table)
    assert int(state.day) == 1
    assert not bool(ts3.terminated | ts3.truncated)


@pytest.mark.unit
def test_quantile_table_zero_count_buckets_excluded():
    """Multi-bucket table with count<=0 rows: excluded from sampling for
    that parameter only (reference count_{param} filtering,
    gymnasium_kw_utils.py:320-322; VERDICT r1: untested path)."""
    import jax

    from adcraft_tpu.keywords import (
        sample_implicit_keywords,
        sample_implicit_keywords_numpy,
    )
    from adcraft_tpu.quantiles import ALL_PARAMS, QuantileTable

    triples = {}
    counts = {}
    for p in ALL_PARAMS:
        # three buckets; the middle one is dead (count 0) and holds
        # poison values that would blow the valid ranges if sampled
        if p == "vol":
            triples[p] = np.asarray(
                [[8.0, 12.0, 16.0], [9e5, 9.6e5, 1e6], [16.0, 24.0, 32.0]]
            )
        else:
            triples[p] = np.asarray(
                [[0.1, 0.2, 0.3], [900.0, 950.0, 1000.0], [0.3, 0.4, 0.5]]
            )
        counts[p] = np.asarray([5, 0, 7], dtype=np.int64)
    table = QuantileTable(triples, counts)

    assert table.param_triples("vol").shape == (2, 3)

    n = 256
    kw_np = sample_implicit_keywords_numpy(
        np.random.default_rng(3), n, table
    )
    kw_jx = sample_implicit_keywords(jax.random.PRNGKey(3), n, table)
    for kw in (kw_np, kw_jx):
        vol = np.asarray(kw.vol_mean)
        assert vol.max() <= 32.0 + 1e-6, "dead vol bucket was sampled"
        assert np.asarray(kw.bctr).max() <= 0.5 + 1e-6
        assert np.asarray(kw.sctr).max() <= 0.5 + 1e-6


@pytest.mark.unit
def test_gym_set_updater_mask():
    """set_updater_mask (reference gymnasium_kw_env.py:105-112): replaces
    the mask, updates num_updates, and rewrites a live episode's keyword
    state so drift starts from the next step."""
    import numpy as np

    from adcraft_tpu.gym_env import BiddingSimulation
    from adcraft_tpu.quantiles import (
        load_experiment_quantiles,
        make_experiment_quantiles,
    )

    env = BiddingSimulation(
        keyword_config={
            "outer_directory": "/tmp",
            "mean_volume": 16,
            "conversion_rate": 0.5,
            "make_quant_func": make_experiment_quantiles,
            "load_quant_func": load_experiment_quantiles,
        },
        num_keywords=4,
    )
    env.reset(seed=3)
    assert env.updater_mask is None
    with pytest.raises(AssertionError):
        env.set_updater_mask([True])  # wrong length
    env.set_updater_mask([True, False, True, False])
    assert env.num_updates == 2
    np.testing.assert_array_equal(
        np.asarray(env.state.kw.updater_mask), [True, False, True, False]
    )
    # env still steps; the masked keywords now drift
    kw_before = np.asarray(env.state.kw.vol_mean).copy()
    for _ in range(3):
        env.step(
            {"keyword_bids": np.full(4, 1.0), "budget": np.array([1000.0])}
        )
    kw_after = np.asarray(env.state.kw.vol_mean)
    np.testing.assert_array_equal(kw_before[[1, 3]], kw_after[[1, 3]])
    assert not np.array_equal(kw_before[[0, 2]], kw_after[[0, 2]])


@pytest.mark.unit
def test_rollout_matches_sequential_steps():
    """env_rollout / VectorBiddingEnv.rollout (one lax.scan program) must
    reproduce the same trajectory as a Python loop of step() calls:
    per-keyword day outcomes and obs bit-exactly, the scalar reward /
    cumulative-profit K-sums to the last float32 ulp (XLA may order the
    K-reduction differently inside a different program)."""
    cfg = EnvConfig(
        num_keywords=7, kind=KeywordKind.IMPLICIT, max_volume=96,
        conv_sampling="counts", rev_sampling="sum", cost_sampling="agg",
        lane_bits=16, binomial_sampler="inversion", gate_scope="chunk",
    )
    table = simple_experiment_table(32, 0.4)
    venv = VectorBiddingEnv(cfg, 6, table=table)
    st0, _ = venv.reset(jax.random.PRNGKey(0))
    bids = jnp.full((6, 7), 1.0)
    bud = jnp.full((6,), 3.0)

    def check(seq_ts, seq_state, roll_ts, roll_state):
        seq = seq_ts._asdict()
        rol = roll_ts._asdict()
        for name in seq:
            a, b = seq[name], rol[name]
            for (pa, la), (pb, lb) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b),
            ):
                la, lb = np.asarray(la), np.asarray(lb)
                tag = f"{name}{jax.tree_util.keystr(pa)}"
                if name == "reward" or "cumulative_profit" in tag:
                    np.testing.assert_allclose(
                        la, lb, atol=1e-5, rtol=1e-6, err_msg=tag
                    )
                else:
                    np.testing.assert_array_equal(la, lb, err_msg=tag)
        for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(seq_state),
            jax.tree_util.tree_leaves_with_path(roll_state),
        ):
            la = np.asarray(la)
            lb = np.asarray(lb)
            if la.dtype.kind == "f":
                np.testing.assert_allclose(la, lb, atol=1e-5, rtol=1e-6)
            else:
                np.testing.assert_array_equal(la, lb)

    # with budget override
    st, seq = st0, []
    for _ in range(4):
        st, ts = venv.step(st, bids, bud)
        seq.append(ts)
    seq_stack = jax.tree.map(lambda *a: jnp.stack(a), *seq)
    st2, roll = venv.rollout(st0, bids, 4, bud)
    check(seq_stack, st, roll, st2)

    # without budget; per-day bid schedule
    sched = jnp.stack([bids * (1.0 + 0.5 * i) for i in range(3)])
    st, seq = st0, []
    for i in range(3):
        st, ts = venv.step(st, sched[i])
        seq.append(ts)
    seq_stack = jax.tree.map(lambda *a: jnp.stack(a), *seq)
    st2, roll = venv.rollout(st0, sched, 3)
    check(seq_stack, st, roll, st2)


@pytest.mark.unit
def test_rollout_pool_agg_matches_steps():
    """rollout() x straggler compaction x BINOMIAL_POOL agg: the scan-
    over-days program must reproduce per-day step() trajectories with
    the pool model's per-cell aux table threaded through the compacted
    gate (the one combination the other rollout/pool tests don't
    cover)."""
    from adcraft_tpu.config import CompetitorModel

    cfg = EnvConfig(
        num_keywords=5, kind=KeywordKind.IMPLICIT, max_volume=96,
        competitor_model=CompetitorModel.BINOMIAL_POOL,
        conv_sampling="counts", rev_sampling="sum", cost_sampling="agg",
        lane_bits=16, binomial_sampler="inversion", gate_scope="chunk",
    )
    table = simple_experiment_table(32, 0.4)
    venv = VectorBiddingEnv(cfg, 96, table=table)  # >= compaction min_batch
    st0, _ = venv.reset(jax.random.PRNGKey(2))
    bids = jnp.full((96, 5), 1.0)
    bud = jnp.full((96,), 2.0)
    st, seq = st0, []
    for _ in range(3):
        st, ts = venv.step(st, bids, bud)
        seq.append(ts)
    seq_stack = jax.tree.map(lambda *a: jnp.stack(a), *seq)
    st2, roll = venv.rollout(st0, bids, 3, bud)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(seq_stack.outcomes),
        jax.tree_util.tree_leaves_with_path(roll.outcomes),
    ):
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb),
            err_msg=jax.tree_util.keystr(pa),
        )
    np.testing.assert_allclose(
        np.asarray(seq_stack.reward), np.asarray(roll.reward),
        atol=1e-5, rtol=1e-6,
    )
