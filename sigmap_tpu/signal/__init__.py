from .events import batch_generate_events
from .events_ref import generate_events

__all__ = ["batch_generate_events", "generate_events"]
