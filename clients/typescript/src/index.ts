export { KektorDBClient, KektorDBError, Task } from "./client";
export type { SearchHit, SearchOptions, IndexInfo, VectorItem, EdgeInfo } from "./client";
export { CognitiveSession } from "./cognitive";
