"""``dtv`` command-line interface.

One entry point exposing subcommands whose flag surfaces and stdout match
the reference tools byte-for-byte (so outputs can be diffed directly):
``dvbtrate``, ``dvbs2rate``, ``dvbt2rate``, ``atsc3rate``, ``papr``,
``dvbt-mod``, ``j83b-mod``, ``dvbt2-mod``, ``xport``, ``l1dump``…

Usage: ``python -m dtv_utils_tpu.cli <tool> [args...]``
"""
