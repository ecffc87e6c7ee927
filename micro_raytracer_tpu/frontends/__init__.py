"""User-facing frontends: CLI, token mini-language, HTTP server, conv2json."""
