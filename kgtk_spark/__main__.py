from kgtk_spark.cli import main

raise SystemExit(main())
