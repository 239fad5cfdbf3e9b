"""Host-side utilities (logging, misc helpers)."""
