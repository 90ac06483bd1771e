"""Source connectors: reading raw inputs into the engine's table model."""
