"""Pure DataFrame -> DataFrame operators implementing SURVEY §2."""
