"""CDC layer: change-log generation, LWW apply, replay, streaming, metrics."""
