"""Experiment harness: reference protocol, trajectory sweeps, CLI."""

from ikpso_tpu.harness.experiment import ExperimentResult, frames_to_converge, run_reference_experiment
from ikpso_tpu.harness.trajectory import SweepResult, solve_waypoints
