from mvropose_tpu.cli.main import main

raise SystemExit(main())
