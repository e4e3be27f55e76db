from navierstokes_tpu.scenarios.cli import main

raise SystemExit(main())
