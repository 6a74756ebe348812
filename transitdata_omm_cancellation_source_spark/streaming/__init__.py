"""Streaming lifecycle: micro-batch poller, snapshot state, message sink."""
