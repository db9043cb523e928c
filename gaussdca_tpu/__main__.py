from gaussdca_tpu.cli import main

raise SystemExit(main())
