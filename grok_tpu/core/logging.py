"""Tri-level callback logger (capability parity with util/logger.h and the
grk_set_{info,warning,error}_handler C API, grok.h:1114-1128)."""

from __future__ import annotations

import logging as _pylogging
from typing import Callable

_logger = _pylogging.getLogger("grok_tpu")

MsgHandler = Callable[[str], None]

_handlers: dict[str, MsgHandler | None] = {"info": None, "warn": None, "error": None}


def set_info_handler(fn: MsgHandler | None) -> None:
    _handlers["info"] = fn


def set_warning_handler(fn: MsgHandler | None) -> None:
    _handlers["warn"] = fn


def set_error_handler(fn: MsgHandler | None) -> None:
    _handlers["error"] = fn


def info(msg: str, *args) -> None:
    if args:
        msg = msg % args
    h = _handlers["info"]
    if h is not None:
        h(msg)
    else:
        _logger.info(msg)


def warn(msg: str, *args) -> None:
    if args:
        msg = msg % args
    h = _handlers["warn"]
    if h is not None:
        h(msg)
    else:
        _logger.warning(msg)


def error(msg: str, *args) -> None:
    if args:
        msg = msg % args
    h = _handlers["error"]
    if h is not None:
        h(msg)
    else:
        _logger.error(msg)
