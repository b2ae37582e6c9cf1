"""Composable DataFrame -> DataFrame operators (the engine core)."""
