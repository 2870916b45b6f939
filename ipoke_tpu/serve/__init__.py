"""Production serving: dynamic request batching over the jitted sample path.

Beyond-reference subsystem (the reference serves nothing; its closest
surface is the single-user PyQt GUI, testing/gui.py).  See batcher.py for
the core and server.py for the HTTP front end.
"""
