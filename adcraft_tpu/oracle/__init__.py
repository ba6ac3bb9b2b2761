"""Reference-parity oracle (pure numpy, fully seeded)."""

from adcraft_tpu.oracle.numpy_env import (
    NumpyOracleEnv,
    simulate_day_numpy,
    simulate_day_native,
)

__all__ = ["NumpyOracleEnv", "simulate_day_numpy", "simulate_day_native"]
