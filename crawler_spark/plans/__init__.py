"""Driver-side plans: the frontier round loop and the Go-oracle spec."""
