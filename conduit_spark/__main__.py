from conduit_spark.cli import main

raise SystemExit(main())
