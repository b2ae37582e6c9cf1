"""Query plans: the registry of named queries + oracle SQL twins."""
