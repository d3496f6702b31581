"""Ray Data stage builders: each function takes and returns a Dataset."""
