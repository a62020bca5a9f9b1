"""Transmit chains (modulators), one module per broadcast standard."""
