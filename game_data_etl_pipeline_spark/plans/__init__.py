"""Plan inspection helpers (explain capture, pushdown / broadcast assertions)."""
