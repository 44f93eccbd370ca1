from impop_tpu.runtime.batcher import build_window_batch, PanelSet
from impop_tpu.runtime.journal import ResultJournal

__all__ = ["build_window_batch", "PanelSet", "ResultJournal"]
