"""Runtime utilities: configs, diagnostics, checkpointing, profiling."""

from ikpso_tpu.utils.configio import RunConfig, dump_config, load_config
from ikpso_tpu.utils.diagnostics import DiagnosticsWriter, SolveLogger
