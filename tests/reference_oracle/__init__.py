"""Direct numerical-parity tests against the reference's own code."""
