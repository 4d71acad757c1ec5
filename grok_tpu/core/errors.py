"""Typed codec exceptions (capability parity with util/grk_exceptions.h)."""


class GrokTpuError(Exception):
    """Base class for all codec errors."""


class CodestreamError(GrokTpuError):
    """Malformed or unsupported codestream."""


class InvalidMarkerError(CodestreamError):
    """Unexpected / unknown marker while parsing."""


class TruncatedStreamError(CodestreamError):
    """Stream ended before expected data."""


class CorruptPacketError(CodestreamError):
    """Packet data failed to parse; decode may continue with zeros."""


class UnsupportedFeatureError(GrokTpuError):
    """Standard-legal feature this build does not implement yet."""


class ParameterError(GrokTpuError):
    """Invalid user-supplied coding parameters."""
