"""``python -m vxtpu`` — dispatch to the CLI (app/run.py)."""

from vxtpu.app.run import main

raise SystemExit(main())
