"""CLI debugging affordances.

Parity reference: both reference CLIs run under
`ipdb.launch_ipdb_on_exception()` (/root/reference/train.py:211-213,
test.py:191-193). ipdb is not on this image; we fall back to pdb, and only
drop into the debugger when stdin is a TTY — a post-mortem prompt in a
batch job would hang it.
"""
import contextlib
import sys
import traceback


@contextlib.contextmanager
def launch_debugger_on_exception():
    try:
        yield
    except (KeyboardInterrupt, SystemExit):
        raise
    except Exception:
        if not sys.stdin.isatty():
            raise
        traceback.print_exc()
        try:
            import ipdb as debugger
        except ImportError:
            import pdb as debugger
        debugger.post_mortem(sys.exc_info()[2])
        raise
