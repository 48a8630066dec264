"""DataFrame → DataFrame operators of the ccer engine."""
