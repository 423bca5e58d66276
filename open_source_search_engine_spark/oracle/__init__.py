from .frontier_oracle import OracleResult, run_oracle  # noqa: F401
