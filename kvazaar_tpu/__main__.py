from kvazaar_tpu.cli import main

raise SystemExit(main())
