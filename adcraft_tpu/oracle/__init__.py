"""Reference-parity oracle (pure numpy, fully seeded)."""

from adcraft_tpu.oracle.numpy_env import NumpyOracleEnv, simulate_day_numpy

__all__ = ["NumpyOracleEnv", "simulate_day_numpy"]
