"""The PSO solver core."""

from ikpso_tpu.pso.config import PSOConfig
from ikpso_tpu.pso.restarts import make_retry_solver, solve_with_retries
from ikpso_tpu.pso.solver import SolveResult, make_solver, solve, solve_single
