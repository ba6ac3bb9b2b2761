"""Golden-trajectory regression tests.

Seeded 6-day trajectories recorded once (tests/golden/trajectories_v1.npz,
CPU f32, threefry keys). Any semantic drift in the step — draw sites, key
tree, gating, accounting — changes these bit patterns; intentional changes
must re-record the goldens and document the reason in PARITY.md.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcraft_tpu.config import EnvConfig, KeywordKind
from adcraft_tpu.env import env_reset, env_step
from adcraft_tpu.keywords import sample_explicit_keywords, sample_implicit_keywords
from adcraft_tpu.quantiles import simple_experiment_table

GOLDEN = Path(__file__).parent / "golden" / "trajectories_v1.npz"


def rollout(kind: KeywordKind) -> np.ndarray:
    cfg = EnvConfig(num_keywords=5, kind=kind, max_volume=192, max_days=6)
    key = jax.random.PRNGKey(2024)
    if kind is KeywordKind.IMPLICIT:
        kw = sample_implicit_keywords(
            jax.random.fold_in(key, 0), 5, simple_experiment_table(32, 0.5)
        )
    else:
        kw = sample_explicit_keywords(jax.random.fold_in(key, 0), 5)
    state, _ = env_reset(cfg, jax.random.fold_in(key, 1), kw=kw)
    bids = jnp.asarray([0.8, 0.4, 1.2, 0.2, 0.6])
    rows = []
    for _ in range(6):
        state, ts = env_step(cfg, state, bids, jnp.asarray(75.0))
        rows.append(
            np.concatenate(
                [
                    np.asarray(ts.obs["impressions"], np.float64),
                    np.asarray(ts.obs["buyside_clicks"], np.float64),
                    np.asarray(ts.obs["cost"], np.float64),
                    np.asarray(ts.obs["sellside_conversions"], np.float64),
                    np.asarray(ts.obs["revenue"], np.float64),
                    [float(ts.reward)],
                ]
            )
        )
    return np.stack(rows)


@pytest.mark.unit
@pytest.mark.parametrize("name,kind", [
    ("implicit", KeywordKind.IMPLICIT),
    ("explicit", KeywordKind.EXPLICIT),
])
def test_golden_trajectory(name, kind):
    golden = np.load(GOLDEN)[name]
    got = rollout(kind)
    np.testing.assert_array_equal(got, golden, err_msg=f"{name} drifted")
